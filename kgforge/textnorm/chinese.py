"""Chinese-corpus cleaning operators (P11-P13, SURVEY.md §2.2) — faithful
ports of /root/reference/examples/chinese_data_sample.py:12-44."""

from __future__ import annotations

import re

from .plane_patterns import CJK

_NORMALIZATION = {"?": "？", "!": "！", "（": "(", "）": ")", "...": "。", ",": "，"}
_NORMALIZER = re.compile(
    "({})".format("|".join(map(re.escape, _NORMALIZATION.keys())))
)


def normalize_puncs(input: str) -> str:
    """P11: normalize en/zh punctuation variants
    (chinese_data_sample.py:12-17)."""
    return _NORMALIZER.sub(
        lambda m: _NORMALIZATION[m.string[m.start() : m.end()]], input
    )


def remove_title(input: str) -> str:
    """P12: blank out lines not ending in 。？！ (titles lack final
    punctuation — chinese_data_sample.py:20-24)."""
    if input.strip() and input.strip()[-1] not in ["。", "？", "！"]:
        return ""
    return input


_cjk_regex = re.compile("(?P<%s>%s)" % (CJK.name, CJK.pattern), CJK.flag)


def revert_ascii_chars_whitespace(input: str) -> str:
    """P13: remove spaces between latin chars while keeping CJK spans
    space-delimited (chinese_data_sample.py:27-44)."""
    result = ""
    start = 0
    for t in _cjk_regex.finditer(input):
        result += " " + "".join(
            [char for char in list(input[start : t.start()]) if char != " "]
        )
        result += " " + input[t.start() : t.end()]
        start = t.end()
    result += input[start:]
    return result
