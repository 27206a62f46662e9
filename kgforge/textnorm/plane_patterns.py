"""Vendored text-pattern primitives compatible with the public ``plane``
library's API surface (``Regex`` namedtuple, ``build_new_regex``,
``replace``, and the ``EMAIL`` / ``TELEPHONE`` / ``CJK`` patterns).

The reference imports these from ``plane`` (see
/root/reference/dbpunctuator/data_process/data_cleanning.py:4-5,
/root/reference/dbpunctuator/utils/constant.py:4,
/root/reference/dbpunctuator/utils/additional_data_process.py:4).
``plane`` is not installed in this sandbox and PyPI is unreachable, so the
patterns below are a best-effort reconstruction of plane>=0.2's public
patterns. They are LOCKED by golden tests in tests/test_plane_patterns.py:
the engine's byte-identity gate compares the Spark path against the oracle
path, and both share exactly this module, so internal consistency is exact.
For production parity with a plane-installed deployment, re-vendor from the
installed plane source and re-run the golden tests.
"""

from __future__ import annotations

import re
from collections import namedtuple

Regex = namedtuple("Regex", ("name", "pattern", "repl", "flag"))


def build_new_regex(name: str, regex: str, repl: str = " ", flag: int = 0) -> Regex:
    """Mirror of plane's ``build_new_regex`` (name, pattern, repl, flag)."""
    name = name.replace(" ", "_")
    return Regex(name, regex, repl, flag)


# RFC-5321-lite local part + dotted domain. plane's Email pattern accepts
# the common special chars in the local part and dashed domain labels.
EMAIL = build_new_regex(
    "Email",
    r"([a-zA-Z0-9!#$%&'*+\/=?^_`{|}~-]+(?:\.[a-zA-Z0-9!#$%&'*+\/=?^_`{|}~-]+)*"
    r"@(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+"
    r"[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)",
    "<Email>",
)

# plane targets CN mobile style numbers: 3-4-4 digit groups with optional
# separators.
TELEPHONE = build_new_regex(
    "Telephone",
    r"\d{3}[ +.-]?\d{4}[ +.-]?\d{4}",
    "<Telephone>",
)

# CJK blocks: Hangul Jamo, CJK Radicals Supplement .. Yi Syllables,
# Phags-pa, Hangul Syllables, CJK Compatibility Ideographs, vertical /
# compatibility forms, halfwidth katakana/jamo, CJK Extension B+.
CJK = build_new_regex(
    "CJK",
    "[ᄀ-ᇿ⺀-꓏ꡀ-꡿가-힯"
    "豈-﫿︰-﹏･-ￜ\U00020000-\U0002a6df]+",
    " ",
)


def replace(text: str, regex: Regex, repl: str | None = None) -> str:
    """plane.replace semantics: substitute every match of ``regex.pattern``
    (compiled with ``regex.flag``) with ``repl`` (default ``regex.repl``).

    Mirrors the call sites at data_cleanning.py:36-55 which always pass an
    explicit replacement token.
    """
    if repl is None:
        repl = regex.repl
    return re.sub(regex.pattern, repl, text, flags=regex.flag)
