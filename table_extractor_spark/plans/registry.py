"""Query-registration plumbing and the engine-parity constants.

One list, one decorator, one hash: every battery module registers its
(name, spark_callable, duckdb_sql) triples here, and plans/queries.py
orders them into the driver window.  The hash/constant contract is
documented in the plans/queries.py module docstring; `functions.hashing`
holds the identical single-definition Spark-side hash for operators.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from pyspark.sql import functions as F

_REGISTRY: List[Tuple[str, Callable, Optional[str]]] = []

# shared minhash parameters (deterministic, engine-agnostic)
MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 rows per band
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: Callable):
        _REGISTRY.append((name, fn, oracle))
        return fn

    return deco


def spark_hash(col) -> F.Column:
    """H(s): 60-bit deterministic hash shared with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


DUCK_HASH = "(('0x' || substr(md5({0}), 1, 15))::bigint)"
