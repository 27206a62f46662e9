"""Golden tests locking the vendored plane-compatible patterns
(kgforge/textnorm/plane_patterns.py). These pin CURRENT behavior so that
re-vendoring from real plane source (see the module docstring) surfaces
every semantic change explicitly."""

import re

from kgforge.textnorm.plane_patterns import (
    CJK,
    EMAIL,
    TELEPHONE,
    Regex,
    build_new_regex,
    replace,
)


def test_build_new_regex_shape():
    r = build_new_regex("my name", r"x+", "<X>", re.I)
    assert isinstance(r, Regex)
    assert r.name == "my_name" and r.pattern == "x+"
    assert r.repl == "<X>" and r.flag == re.I
    assert build_new_regex("d", "p").repl == " "  # default repl


EMAIL_GOLDENS = [
    ("simple bob@example.com here", "simple <E> here"),
    ("dot.ted+tag@sub.example.co.uk", "<E>"),
    ("specials o'brien{x}!#$%&@ex-ample.org", "specials <E>"),
    ("no at sign example.com", "no at sign example.com"),
    ("trailing dot bob@example.com.", "trailing dot <E>."),
    ("a@b", "a@b"),  # no dotted domain → not an email
]


def test_email_goldens():
    for text, want in EMAIL_GOLDENS:
        assert replace(text, EMAIL, "<E>") == want, text


TEL_GOLDENS = [
    ("call 139 1234 5678 now", "call <T> now"),
    ("13912345678", "<T>"),
    ("139-1234-5678", "<T>"),
    ("139.1234.5678", "<T>"),
    ("12345 is short", "12345 is short"),
    # quirk: any 11+ digit run matches its first 11 digits
    ("123456789012", "<T>2"),
]


def test_telephone_goldens():
    for text, want in TEL_GOLDENS:
        assert replace(text, TELEPHONE, "<T>") == want, text


def test_cjk_goldens():
    rx = re.compile(CJK.pattern, CJK.flag)
    assert rx.findall("中文 and 日本語 and 한국어") == ["中文", "日本語", "한국어"]
    assert rx.findall("halfwidth ｶﾀｶﾅ") == ["ｶﾀｶﾅ"]
    assert rx.findall("compat 豈") == ["豈"]
    assert rx.findall("plain latin text") == []
    assert rx.findall("русский ελληνικά") == []  # cyrillic/greek are NOT CJK
    # named-group compilation used by chinese_split must stay valid
    named = re.compile("(?P<%s>%s)" % (CJK.name, CJK.pattern), CJK.flag)
    assert [m.group() for m in named.finditer("a中b")] == ["中"]


def test_replace_uses_default_repl():
    r = build_new_regex("spaces", r"\s+", "_")
    assert replace("a  b\tc", r) == "a_b_c"
