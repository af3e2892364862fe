"""Python-2-``float()``/``int()``-compatible numeric tests and rendering.

The reference types cell values with bare ``float(value)`` / ``int(value)`` calls
(``/root/reference/table_extractor/HtmlTableParser.py:902-912``,
``MapperTools.py:183-209``) under Python 2.7.  Spark's ``try_cast`` accepts a
different grammar (e.g. trailing 'D', commas under ANSI off), so numeric typing
stays in-kernel (SURVEY.md §7.2).  Differences vs Python 3 handled here:

* Python 3 ``float("1_0")`` == 10.0; Python 2 raises ValueError  -> reject '_'.
* Everything else the fixtures exercise ('1e2', ' 7 ', 'nan', 'inf', u'\\u00a0'
  stripping behavior) agrees between 2.7 and 3.x.

Rendering: the reference stringifies values with ``str()`` at
``MapperTools.py:327-330``; Python 2 ``str(float)`` used 12 significant digits,
Python 3 uses ``repr`` (shortest round-trip).  The two agree on all short
decimals; we use Python 3 ``str`` and pin that choice in the golden fixtures
(SURVEY.md §2.10: pin observable output, not buggy mechanics).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

# fast-reject guard: most cell values are words, and raising/catching
# ValueError per cell dominates the typing cost.  A stripped ASCII string
# whose first char cannot start any float literal ('nan'/'inf' included) is
# guaranteed to raise — reject without the exception.  Non-ASCII strings
# (unicode digits, exotic whitespace) always take the exact float() path.
_FLOAT_START = frozenset("0123456789+-.nNiI")


def _fast_nonfloat(value: Any) -> bool:
    if type(value) is not str or not value.isascii():
        return False
    t = value.strip()
    return not t or t[0] not in _FLOAT_START


# Each cell string gets float-tested ~3x along the kernel path (type
# resolution, then the summary filter's is_float AND is_int), and real
# tables repeat values heavily ('-', years, small counts) — a bounded memo
# on the STRING paths is ~10% of whole-document kernel time (profiled).
# Pure functions of the string; the non-string paths stay uncached (and
# unhashable inputs can never hit the cache).


@lru_cache(maxsize=1 << 16)
def _str_is_float_py2(value: str) -> bool:
    if "_" in value or _fast_nonfloat(value):
        return False
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        return False


@lru_cache(maxsize=1 << 16)
def _str_is_int_py2(value: str) -> bool:
    if "_" in value or _fast_nonfloat(value):
        return False
    try:
        int(value)
        return True
    except (TypeError, ValueError):
        return False


def py2_is_float(value: Any) -> bool:
    """``MapperTools.is_float`` semantics: True iff ``float(value)`` succeeds in py2."""
    if type(value) is str:
        return _str_is_float_py2(value)
    if isinstance(value, str) and "_" in value:  # str subclass
        return False
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        return False


def py2_is_int(value: Any) -> bool:
    """``MapperTools.is_int`` semantics: True iff ``int(value)`` succeeds in py2."""
    if type(value) is str:
        return _str_is_int_py2(value)
    if isinstance(value, str) and "_" in value:  # str subclass
        return False
    try:
        int(value)
        return True
    except (TypeError, ValueError):
        return False


def parser_is_float(value: Any) -> bool:
    """``HtmlTableParser.is_float`` (:902-912): catches ValueError only.

    A non-string input raising TypeError would propagate in the reference; by
    the time it is called the value is always a string, so behavior matches
    (and the string path shares ``py2_is_float``'s memo — the predicates
    agree on strings: both reduce to ``float(value)`` raising or not).
    """
    if type(value) is str:
        return _str_is_float_py2(value)
    if _fast_nonfloat(value):
        return False
    try:
        float(value)
        return True
    except ValueError:
        return False


def value_to_str(value: Any) -> str:
    """``MapperTools.extract_value_from_cell`` tail (:327-330): str() non-strings."""
    if isinstance(value, str):
        return value
    return str(value)
