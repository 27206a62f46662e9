"""Closed tag sets, sentinel tokens, and masking patterns.

Semantics mirror /root/reference/dbpunctuator/utils/constant.py:6-69 —
same tag names, same sentinel tokens, same pattern construction (URL at
:12-15, CURRENCY built from every Unicode ``Sc`` codepoint at :58-67,
NUMBER at :69, ALL_PUNCS = every codepoint in categories ``P*`` or ``Cc``
at :52-56). Unlike the reference, the expensive full-Unicode scans are
lazy + cached so Spark python workers only pay them once per process and
only when a stage actually needs them.
"""

from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache

from .plane_patterns import build_new_regex

NORMAL_TOKEN_TAG = "O"
EMAIL_TOKEN = "<EMAIL>"
URL_TOKEN = "<URL>"
TELEPHONE_TOKEN = "<TEL>"
CURRENCY_TOKEN = "<CURRENCY>"
NUMBER_TOKEN = "<NUM>"

URL = build_new_regex(
    "url_checking",
    r"https?:\/\/[!-~]+|[!-~]+\.[-_a-z/]+",
)

NUMBER = build_new_regex("number", r"[0-9]*[.]?[0-9]+[%]?")

DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP = {
    NORMAL_TOKEN_TAG: ("", False),
    "COMMA": (",", False),
    "PERIOD": (".", True),
    "QUESTIONMARK": ("?", True),
    "EXLAMATIONMARK": ("!", True),
}

DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP = {
    NORMAL_TOKEN_TAG: ("", False),
    "C_COMMA": ("，", False),
    "C_PERIOD": ("。", True),
    "C_QUESTIONMARK": ("? ", True),
    "C_EXLAMATIONMARK": ("! ", True),
    "C_DUNHAO": ("、", False),
}

DEFAULT_ENGLISH_NER_MAPPING = {
    ",": "COMMA",
    ".": "PERIOD",
    "?": "QUESTIONMARK",
    "!": "EXLAMATIONMARK",
}

DEFAULT_CHINESE_NER_MAPPING = {
    "，": "C_COMMA",
    "。": "C_PERIOD",
    "？": "C_QUESTIONMARK",
    "！": "C_EXLAMATIONMARK",
    "、": "C_DUNHAO",
}


@lru_cache(maxsize=1)
def all_puncs() -> tuple[int, ...]:
    """Every codepoint whose category starts with ``P`` or ``Cc``
    (constant.py:52-56). ~1.1M-codepoint scan; cached per process."""
    return tuple(
        c
        for c in range(sys.maxunicode)
        if unicodedata.category(chr(c)).startswith(("P", "Cc"))
    )


_CURRENCY_PATTERN: str | None = None


def currency_regex_pattern() -> str:
    """CURRENCY pattern string built from every ``Sc`` codepoint
    (constant.py:58-67). The leading ``\\`` escapes the first currency
    char (``$``), exactly as the reference's format string does.

    The full-Unicode scan costs ~1s; Spark stages precompute it on the
    driver and ship the string to executors via ``prime_currency_pattern``
    in the UDF closure (SURVEY.md §4.1: never pay the scan per executor)."""
    global _CURRENCY_PATTERN
    if _CURRENCY_PATTERN is None:
        currency_list = "|".join(
            chr(c)
            for c in range(sys.maxunicode)
            if unicodedata.category(chr(c)).startswith(("Sc"))
        )
        _CURRENCY_PATTERN = r"(\{})\d+([.,]?\d*)*([A-Za-z]+)?".format(currency_list)
    return _CURRENCY_PATTERN


def prime_currency_pattern(pattern: str) -> None:
    """Install a driver-precomputed CURRENCY pattern (executor fast path)."""
    global _CURRENCY_PATTERN
    _CURRENCY_PATTERN = pattern


@lru_cache(maxsize=1)
def currency_regex():
    return build_new_regex("currency", currency_regex_pattern())
