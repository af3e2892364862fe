"""The engine-wide deterministic hash, in ONE place.

H(s) = bigint(first 15 hex chars of md5(s)) — 60 bits, always
non-negative, computed identically by the DuckDB oracles as
``('0x' || substr(md5(s), 1, 15))::bigint`` (``DUCK_HASH`` in
plans/queries.py).  Every oracle-replayed hash in the engine (count-min
cells, HLL buckets, LSH bands, packing shards, classifier weights)
derives from this function; changing the prefix width here without
changing every oracle breaks the parity contract, which is exactly why
the definition should not be copied around.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def hash60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
