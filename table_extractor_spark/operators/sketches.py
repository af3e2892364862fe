"""Frequency sketches: count-min over a corpus-scale key stream.

Count-min (Cormode & Muthukrishnan, "An Improved Data Stream Summary:
The Count-Min Sketch and its Applications", J. Algorithms 2005 — public
method, independent implementation): d independent hash rows of width w;
each key increments one cell per row; a point estimate is the MIN of its
d cells — an overestimate bounded by eps * N with probability 1 - delta
(w = ceil(e/eps), d = ceil(ln 1/delta)).

Why it matters at 100 TB: exact per-key counts need a full keyspace
shuffle (vocabulary-sized at best, URL/n-gram-sized at worst).  The
sketch's groupBy key space is d*w cells REGARDLESS of corpus size — the
aggregation partial-combines map-side into a bounded table that fits in
one broadcast, so downstream consumers (heavy-ish hitter screens,
frequency gates in curation) read it without touching the corpus again.

Determinism: the row hashes reuse the engine-wide md5-prefix arithmetic
(`spark_hash` semantics) salted per row, so a DuckDB oracle replays every
cell and every estimate bit-for-bit — no RNG, no approximation drift
between engines (the approximation is IN the algorithm, identically on
both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# shared with the SQL oracle: H(s) = bigint(first 15 hex chars of md5(s))
def _hash60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def countmin_sketch(
    keys: DataFrame, key_col: str = "key", depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, cell, cnt): the count-min table over the key stream.

    One explode to d rows per key occurrence, one partial-agg'd groupBy on
    (row, cell) — d*w output rows total.  The per-row cell is
    H(row || '|' || key) % width (row-salted shared hash)."""
    rows = keys.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.pmod(
                    _hash60(
                        F.concat(
                            r.cast("string"), F.lit("|"), F.col(key_col)
                        )
                    ),
                    F.lit(width),
                ),
            )
        ).alias("row", "cell")
    )
    return rows.groupBy("row", "cell").agg(F.count("*").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est_cnt): point estimates for the queried keys — MIN over the
    d row cells.  The sketch (d*w rows) broadcasts; each query key joins
    its d cells map-side, so estimation never shuffles either side by
    key."""
    qcells = queries.select(
        F.col(key_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.pmod(
                    _hash60(
                        F.concat(
                            r.cast("string"), F.lit("|"), F.col(key_col)
                        )
                    ),
                    F.lit(width),
                ),
            )
        ).alias("row", "cell"),
    )
    return (
        qcells.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )
