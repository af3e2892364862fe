"""JVM-side py2-float grammar predicate (F10).

The reference types cell values with bare py2 ``float(value)``
(``/root/reference/table_extractor/MapperTools.py:183-195``); Spark's
``try_cast('double')`` accepts a DIFFERENT grammar — notably trailing
'D'/'F'/'d'/'f' suffixes ('1.5D' casts to 1.5 in Spark, raises in py2) — so
typing through try_cast silently diverges from the reference on such cells.

``PY2_FLOAT_RE`` is the ASCII py2 ``float()`` grammar: optional ASCII
whitespace, optional sign, then (digits[.digits] | .digits)[exponent] or
inf/infinity/nan (case-insensitive).  Java regex and DuckDB's RE2 both
support the scoped (?i:) group, so the SAME pattern string runs on both
engines — the oracle can replay the predicate exactly.

Documented divergence: py2 ``float(u'٠')`` (unicode decimal digits)
succeeds; this predicate rejects them.  The kernel's differential harness
exercises only ASCII numerics (real wiki cells that type as floats are
ASCII), and keeping the predicate pure-regex keeps typing whole-stage
codegen'd instead of crossing into Python per cell.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# shared Spark <-> DuckDB pattern (Java regex and RE2 compatible)
PY2_FLOAT_RE = (
    r"^[ \t\n\x0b\f\r]*[+-]?"
    r"((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|(?i:inf(inity)?|nan))"
    r"[ \t\n\x0b\f\r]*$"
)


def py2_float_matches(col: Column) -> Column:
    """True iff py2 ``float(col)`` would succeed (ASCII grammar)."""
    return col.rlike(PY2_FLOAT_RE)
