"""Salted equi-join: explicit skew mitigation for hot join keys.

A plain shuffle join on a skewed key sends every row of a hot key to ONE
reducer: at 10^12 rows a single 'click'-grade key is a multi-TB partition
that stalls the stage (AQE's skew-join split helps SortMergeJoin but not
the general case, and does nothing when the skew is in a grouping that
follows).  The classic fix is salting: the big side gets a deterministic
per-row salt in [0, n_salts), the small side is replicated once per salt
value, and the join key becomes (key, salt) — each hot key now spreads
over n_salts reducers.  Cost: the small side is materialized n_salts
times (choose n_salts ~ the skew factor, not thousands), the big side is
not duplicated at all.

Determinism rule: the salt comes from a hash of a caller-named unique
row key, never ``rand()`` — task retries must re-produce the same salt or
a lost executor yields duplicate/missing rows at scale.

Reference scale context: the reference processes resources one at a time
(``Analyzer.py`` loop), so key skew cannot arise there; this operator
exists for the 10^12-row joins the Spark rebuild targets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on equi-key(s) ``on``, spreading
    each key over ``n_salts`` reducers.  ``row_key`` is a unique column of
    ``big`` used to derive the deterministic salt.  Result is EXACTLY the
    plain ``big.join(small, on, how)`` — salting changes the physical
    partitioning, never the answer (pinned in tests by set-equality against
    the unsalted join).

    Supported ``how``: ``inner`` and ``left`` (every big row carries exactly
    one salt and the small side carries all salts, so left semantics are
    preserved).  Right/full would need the small side de-replicated after
    the join — refuse rather than silently double rows."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    dup = set(keys) & {_SALT} | ({_SALT} & set(big.columns) | {_SALT} & set(small.columns))
    if dup:
        raise ValueError(f"reserved column name in inputs: {sorted(dup)}")
    salted_big = big.withColumn(
        _SALT,
        F.pmod(F.hash(F.col(row_key), F.lit(0x5A17)), F.lit(n_salts)).cast("int"),
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, keys + [_SALT], how).drop(_SALT)


def bloom_reduced_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    bits: int = 4096,
    hashes: int = 3,
) -> DataFrame:
    """Inner equi-join where the big side is PREFILTERED map-side through a
    Bloom sketch of the small side's keys before it ever shuffles — the
    runtime-filter / semi-join-reduction pattern, made explicit and
    oracle-checkable.

    Why: when BOTH join sides are fact-sized (no broadcast), a plain SMJ
    shuffles the full big side even if only a sliver of its keys match.
    The Bloom set-bit table collapses to one broadcast array row
    (<= ``bits`` elements); non-matching big rows die in their map task.
    Bloom has NO false negatives, so no match is lost; false positives
    (rate ~(1-e^{-kn/m})^k) just ride the shuffle and are dropped by the
    exact join — the answer is EXACTLY the plain join at any bits/hashes.
    At 10^12 rows this turns 'shuffle everything' into 'shuffle the
    matching fraction plus epsilon'."""
    from .sketches import bloom_bits, bloom_probe

    bloom = bloom_bits(
        small.select(F.col(small_key).cast("string").alias("key")),
        key_col="key",
        bits=bits,
        hashes=hashes,
    )
    screened = (
        bloom_probe(
            bloom,
            big.withColumn("__bk", F.col(big_key).cast("string")),
            key_col="__bk",
            bits=bits,
            hashes=hashes,
        )
        .filter(F.col("bloom_hit") == 1)
        .drop("bloom_hit", "__bk")
    )
    return screened.join(small, screened[big_key] == small[small_key], "inner")
