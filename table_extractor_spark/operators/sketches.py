"""Bounded-state sketches over corpus-scale streams: count-min
(frequency), HyperLogLog (cardinality), Bloom (membership), equi-width
histogram (quantile brackets).  Common contract: the aggregation key
space is bounded regardless of corpus size, partials combine map-side,
the result broadcasts, and every hash is md5-prefix-deterministic so a
DuckDB oracle replays the sketch bit-for-bit.

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

# shared with the SQL oracle: H(s) = bigint(first 15 hex chars of md5(s));
# single definition in functions/hashing.py, kept under the old name here
# for the module's internal call sites
from ..functions.hashing import hash60 as _hash60  # noqa: E402


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
    # LEFT join + coalesce 0: a cell the stream never touched is a ZERO
    # counter — the sketch's proof that the key was never seen.  An
    # inner join would drop never-seen probe keys entirely and run MIN
    # over only the surviving cells for partially-missing ones.
    return (
        qcells.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt")
        )
    )


# --- HyperLogLog distinct-count sketch --------------------------------------
#
# Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm", AofA 2007 — public
# method, independent implementation.  m registers; each key lands in
# bucket H_b(key) % m and contributes rho = leading-rank of a second
# independent salted hash H_r(key); the register keeps the MAX rho.
#
# Why it matters at 100 TB: exact COUNT(DISTINCT) over a corpus-scale key
# stream (URLs, shingles, vocabulary) is a full keyspace shuffle.  The
# sketch's aggregation key space is m registers regardless of corpus
# size (map-side partial max), and two sketches MERGE by bucket-wise max
# — so every executor sketches its shard independently and the union of
# any number of shards reduces to an m-row table.  MAX is idempotent, so
# no distinct() pass is needed upstream.
#
# Engine-reproducibility policy (same as count-min / rare_word_rank):
# md5-prefix hashes, rho = 61 - length(bin(h)) (both engines print
# minimal-width binary), and the estimate is INTEGER-EXACT end-to-end —
# S = sum over registers of 2^(rho_cap - rho) fits int64
# (m * 2^rho_cap <= 2^48 at the defaults), the harmonic-mean inverse is
# one bigint div, and the bias constant alpha enters as a fixed ppm
# integer.  No transcendentals, no floats, so a DuckDB oracle replays
# every register and the estimate itself bit-for-bit.  The standard
# small-range linear-counting correction needs ln(); per the engine
# policy it is NOT applied — v_empty ships in the output so a consumer
# can apply any correction downstream.


def _hll_alpha_ppm(buckets: int) -> int:
    """The HLL bias constant as parts-per-million (public constants from
    the paper: 0.673 / 0.697 / 0.709 for m = 16 / 32 / 64, else
    0.7213 / (1 + 1.079/m)).  Integerized once here so both engines
    consume the identical constant."""
    if buckets <= 16:
        return 673000
    if buckets <= 32:
        return 697000
    if buckets <= 64:
        return 709000
    return int(0.7213 / (1.0 + 1.079 / buckets) * 1_000_000)


def hll_sketch(
    keys: DataFrame,
    key_col: str = "key",
    buckets: int = 256,
    rho_cap: int = 40,
) -> DataFrame:
    """(bucket, rho): the full m-register table (empty registers present
    with rho = 0, so downstream estimation and v_empty need no spine).

    One narrow projection + one m-key partial-agg'd groupBy; the bucket
    spine is a broadcast range join.  rho saturates at ``rho_cap``
    (default 40 — a register only saturates past ~2^40 distinct keys per
    bucket, far beyond any real corpus; the cap is what keeps the
    estimator integer-exact)."""
    h_b = F.pmod(
        _hash60(F.concat(F.lit("b|"), F.col(key_col))), F.lit(buckets)
    )
    h_r = _hash60(F.concat(F.lit("r|"), F.col(key_col)))
    # minimal-width binary length == floor(log2(h)) + 1 for h > 0, so
    # 61 - length is the leading-zero rank of a 60-bit hash, in [1, 60]
    rho = F.least(F.lit(rho_cap), F.lit(61) - F.length(F.bin(h_r)))
    reg = (
        keys.select(h_b.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spine = keys.sparkSession.range(buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    return spine.join(F.broadcast(reg), "bucket", "left").select(
        "bucket", F.coalesce(F.col("rho"), F.lit(0)).cast("int").alias("rho")
    )


def hll_sketch_grouped(
    keys: DataFrame,
    group_col: str,
    key_col: str = "key",
    buckets: int = 256,
    rho_cap: int = 40,
) -> DataFrame:
    """(group, bucket, rho): one full register table PER GROUP — G*m
    aggregation keys regardless of corpus size (per-language / per-domain
    vocabulary richness at 100 TB without a per-group COUNT(DISTINCT)
    shuffle).  The group spine comes from the keys themselves (one
    G-sized distinct), so every observed group gets all m registers."""
    h_b = F.pmod(
        _hash60(F.concat(F.lit("b|"), F.col(key_col))), F.lit(buckets)
    )
    h_r = _hash60(F.concat(F.lit("r|"), F.col(key_col)))
    rho = F.least(F.lit(rho_cap), F.lit(61) - F.length(F.bin(h_r)))
    reg = (
        keys.select(
            F.col(group_col), h_b.alias("bucket"), rho.alias("rho")
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("rho"))
        .alias("reg")
    )
    spine = (
        keys.select(group_col)
        .distinct()
        .crossJoin(
            F.broadcast(
                keys.sparkSession.range(buckets).select(
                    F.col("id").cast("long").alias("bucket")
                )
            )
        )
        .alias("spine")
    )
    # eqNullSafe on the group key: a NULL group is a group like any
    # other (a null-unsafe join would zero out its registers and
    # silently estimate 0 for it)
    return spine.join(
        reg,
        F.col(f"spine.{group_col}").eqNullSafe(F.col(f"reg.{group_col}"))
        & (F.col("spine.bucket") == F.col("reg.bucket")),
        "left",
    ).select(
        F.col(f"spine.{group_col}").alias(group_col),
        F.col("spine.bucket").alias("bucket"),
        F.coalesce(F.col("reg.rho"), F.lit(0)).cast("int").alias("rho"),
    )


def hll_estimate_grouped(
    registers: DataFrame,
    group_col: str,
    buckets: int = 256,
    rho_cap: int = 40,
) -> DataFrame:
    """Per-group (m, v_empty, s_scaled, est_distinct) — the grouped
    analogue of ``hll_estimate``, same integer-exact arithmetic and the
    same int64 alpha-budget guard per group."""
    alpha = _hll_alpha_ppm(buckets)
    m2c = buckets * buckets * (1 << rho_cap)
    q_budget = (1 << 62) // alpha
    agg = registers.groupBy(group_col).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_cap} - rho)")
        ).alias("s_scaled"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_empty"),
        F.count("*").alias("m"),
    )
    q = agg.withColumn(
        "__q", F.expr(f"CAST({m2c} AS BIGINT) div s_scaled")
    ).withColumn(
        "__qc",
        F.when(
            F.assert_true(
                F.col("__q") < F.lit(q_budget),
                F.concat(
                    F.lit("hll_estimate: harmonic term exceeds the int64 "
                          "alpha budget in group "),
                    F.col(group_col).cast("string"),
                ),
            ).isNull(),
            F.col("__q"),
        ),
    )
    return q.select(
        group_col,
        F.col("m").cast("long").alias("m"),
        "v_empty",
        F.col("s_scaled").cast("long").alias("s_scaled"),
        F.expr(
            "CAST(CASE WHEN v_empty = m THEN 0 "
            f"ELSE ({alpha} * __qc) div 1000000 END AS BIGINT)"
        ).alias("est_distinct"),
    )


def countmin_join_size(
    a: DataFrame,
    b: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
    sum_budget: int = 1 << 62,
) -> DataFrame:
    """(est_join_rows,): upper-bound estimate of |A join_key B| from the
    INNER PRODUCT of the two sides' count-min cell tables (Cormode &
    Muthukrishnan 2005, the sketch's second classic use after point
    queries): for each of the d rows, sum cntA*cntB over the w cells;
    hash collisions only ADD cross terms, so every row upper-bounds the
    true join cardinality and the MIN over rows is the tightest.  This is
    the pre-flight check for a join (especially a self-join on a skewed
    key, where the true size is sum of cnt(k)^2 and can be quadratic):
    two bounded d*w sketches and a d*w-row join answer "will this
    explode" WITHOUT shuffling either table by the key.

    est >= true always; the estimate is exact when no two keys collide in
    any cell of the winning row.  The per-row product sum is guarded
    against int64 wrap (negative or over-budget fails the job loudly, the
    engine's exact-or-fail policy)."""
    sa = countmin_sketch(a, key_col=key_col, depth=depth, width=width)
    sb = countmin_sketch(b, key_col=key_col, depth=depth, width=width)
    prod = (
        sa.alias("a")
        .join(sb.alias("b"), ["row", "cell"])
        .select(
            F.col("row"),
            (F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("__p"),
        )
    )
    per_row = prod.groupBy("row").agg(F.sum("__p").cast("long").alias("__s"))
    # a row with NO overlapping cells proves the join is empty — keep it
    # as an explicit 0 so the MIN can see it.  The spine is the STATIC
    # 0..depth-1 range, not a side's sketch rows: an empty input must
    # yield 0 (its join with anything is empty), never NULL, and the
    # answer must be symmetric in a and b
    spine = (
        a.sparkSession.range(depth)
        .select(F.col("id").cast("int").alias("row"))
    )
    s = F.coalesce(F.col("__s"), F.lit(0).cast("long"))
    guarded = F.when(
        F.assert_true(
            (s >= 0) & (s < F.lit(sum_budget)),
            F.lit(
                "countmin_join_size: per-row product sum exceeds the int64 "
                "budget; widen the sketch or pre-aggregate the hot keys"
            ),
        ).isNull(),
        s,
    )
    return (
        spine.join(per_row, "row", "left")
        .select(guarded.alias("__g"))
        .agg(F.min("__g").cast("long").alias("est_join_rows"))
    )


def countmin_heavy_hitters(
    keys: DataFrame,
    threshold: int,
    key_col: str = "key",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """(key, est_cnt, cnt): every key with true count >= threshold —
    exact counts, PROVABLY complete, and the only corpus-keyed shuffle
    is over occurrences of candidate (hot-or-colliding) keys.

    The sketch collapses to ONE broadcast map row (d*w entries,
    bounded); every occurrence then computes its own estimate map-side
    (MIN over its d cells) and the stream is FILTERED to est_cnt >=
    threshold before any shuffle.  est >= true always, so no true heavy
    hitter can be screened out; the exact groupBy that follows runs
    only on surviving occurrences and removes the collision-noise
    candidates.  No distinct-key pass, no data-dependent broadcast —
    the broadcast side is the fixed-size sketch itself."""
    sk = countmin_sketch(keys, key_col=key_col, depth=depth, width=width)
    cmap = F.broadcast(
        sk.agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("row") * width + F.col("cell")).alias("k"),
                        F.col("cnt").alias("v"),
                    )
                )
            ).alias("__cm")
        )
    )
    est = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda r: F.coalesce(
                F.element_at(
                    F.col("__cm"),
                    r.cast("long") * F.lit(width)
                    + F.pmod(
                        _hash60(
                            F.concat(
                                r.cast("string"), F.lit("|"), F.col(key_col)
                            )
                        ),
                        F.lit(width),
                    ),
                ),
                F.lit(0),
            ),
        )
    )
    hot = (
        keys.crossJoin(cmap)
        .withColumn("est_cnt", est)
        .filter(F.col("est_cnt") >= F.lit(threshold))
        .drop("__cm")
    )
    return (
        hot.groupBy(key_col, "est_cnt")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .select(key_col, "est_cnt", "cnt")
    )


# --- Bloom filter membership sketch -----------------------------------------
#
# Bloom, "Space/time trade-offs in hash coding with allowable errors",
# CACM 1970 — public method, independent implementation.  k salted
# hashes set k bits per member; a probe is "possibly present" iff all k
# of its bits are set.  No false negatives ever; false positives at the
# classic (1 - e^(-kn/m))^k rate.
#
# Why it matters at 100 TB: the standing-corpus membership screen.  An
# incoming batch that must be checked against 10^12 already-ingested
# doc ids (or URL hashes, or benchmark grams) cannot afford a join
# against the standing index per batch.  The bloom's set-bit table is
# at most m rows REGARDLESS of member count, partial-combines map-side,
# and broadcasts — so the batch filters map-side and only bloom-positive
# rows (true members + the bounded false-positive tail) proceed to the
# exact standing-index join.  bloom_hit = 0 is a PROOF of novelty.
#
# Determinism: same md5-prefix hash family as count-min, salted per
# hash row, so a DuckDB oracle replays every bit and every verdict.


def bloom_bits(
    members: DataFrame,
    key_col: str = "key",
    bits: int = 1024,
    hashes: int = 3,
) -> DataFrame:
    """(bit,): the distinct set-bit table — at most ``bits`` rows no
    matter how many members.  bit_h = H(h || '|' || key) % bits."""
    return members.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(hashes - 1)),
                lambda h: F.pmod(
                    _hash60(
                        F.concat(
                            h.cast("string"), F.lit("|"), F.col(key_col)
                        )
                    ),
                    F.lit(bits),
                ),
            )
        ).alias("bit")
    ).distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    bits: int = 1024,
    hashes: int = 3,
) -> DataFrame:
    """probes + (bloom_hit,): 1 iff ALL k bits of the key are set.

    The set-bit table collapses to ONE sorted-array row (<= ``bits``
    elements) that broadcasts; each probe row then answers map-side via
    forall/array_contains — the probe side never shuffles, never
    explodes, and keeps every other probe column.  This is the shape
    that screens a 10^12-row incoming batch: one tiny broadcast, zero
    exchanges on the big side."""
    barr = F.broadcast(
        bloom.agg(F.sort_array(F.collect_set("bit")).alias("__bloom_bits"))
    )
    hit = F.forall(
        F.transform(
            F.sequence(F.lit(0), F.lit(hashes - 1)),
            lambda h: F.array_contains(
                F.col("__bloom_bits"),
                F.pmod(
                    _hash60(
                        F.concat(
                            h.cast("string"), F.lit("|"), F.col(key_col)
                        )
                    ),
                    F.lit(bits),
                ),
            ),
        ),
        lambda x: x,
    )
    return (
        probes.crossJoin(barr)
        .withColumn("bloom_hit", hit.cast("long"))
        .drop("__bloom_bits")
    )


# --- Histogram quantile sketch ----------------------------------------------
#
# The equi-width histogram: bin = value div bin_width, one bounded-key
# groupBy (value-range/bin_width cells regardless of row count,
# map-side partial combine).  A p-quantile is then bracketed by the
# first bin whose cumulative count reaches ceil(p * N): the true
# quantile lies in [bin*w, bin*w + w - 1] by construction — a hard
# bracket, not a probabilistic one.  Integer-exact end-to-end (ppm
# probabilities, bigint cumulative compare), so a DuckDB oracle replays
# every bin and every bracket.  At 100 TB this replaces a full sort /
# exact percentile shuffle with one bounded aggregation whose result
# broadcasts.


def histogram_sketch(
    vals: DataFrame, val_col: str = "val", bin_width: int = 8
) -> DataFrame:
    """(bin, cnt): equi-width histogram over a non-negative integer
    column.  Bounded key space: max(val)/bin_width bins."""
    return (
        vals.select(
            F.expr(f"CAST({val_col} AS BIGINT) div {bin_width}").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


# the ppm compare multiplies row counts by 10^6: int64-safe only below
# ~4.6e12 rows per (group's) histogram — fail loudly past it (the
# engine-wide exact-or-fail policy), never wrap
_PPM_BUDGET = (1 << 62) // 1_000_000


def _ppm_guarded_total(total_col: F.Column) -> F.Column:
    return F.when(
        F.assert_true(
            total_col < F.lit(_PPM_BUDGET),
            F.lit(
                "histogram_quantile_brackets: row count exceeds the int64 "
                "ppm budget (~4.6e12); shard the input or pre-aggregate"
            ),
        ).isNull(),
        total_col,
    )


def histogram_quantile_brackets(
    hist: DataFrame, probs_ppm, bin_width: int = 8
) -> DataFrame:
    """(p_ppm, est_lo, est_hi): for each probability (ppm), the
    bracketing bin — the first bin where cum * 10^6 >= p_ppm * N.
    The histogram is tiny (bounded bins), so the window cumsum and the
    probs cross join never touch corpus-scale data."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "n_total",
        _ppm_guarded_total(F.sum("cnt").over(Window.partitionBy())),
    )
    probs = spark.createDataFrame(
        [(int(p),) for p in probs_ppm], "p_ppm bigint"
    )
    hit = cum.crossJoin(F.broadcast(probs)).filter(
        F.col("cum") * F.lit(1_000_000) >= F.col("p_ppm") * F.col("n_total")
    )
    return hit.groupBy("p_ppm").agg(
        (F.min("bin") * F.lit(bin_width)).cast("long").alias("est_lo"),
        (F.min("bin") * F.lit(bin_width) + F.lit(bin_width - 1))
        .cast("long")
        .alias("est_hi"),
    )


def histogram_sketch_grouped(
    vals: DataFrame,
    group_col: str,
    val_col: str = "val",
    bin_width: int = 8,
) -> DataFrame:
    """(group, bin, cnt): one equi-width histogram per group — G * bins
    aggregation keys regardless of row count (per-language/per-source
    length profiles at 100 TB without a per-group sort)."""
    return (
        vals.select(
            F.col(group_col),
            F.expr(f"CAST({val_col} AS BIGINT) div {bin_width}").alias("bin"),
        )
        .groupBy(group_col, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantile_brackets_grouped(
    hist: DataFrame, group_col: str, probs_ppm, bin_width: int = 8
) -> DataFrame:
    """(group, p_ppm, est_lo, est_hi): per-group quantile brackets —
    the grouped analogue of ``histogram_quantile_brackets``; the window
    partitions by group, so no single-partition stage appears even when
    G is large."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    g = Window.partitionBy(group_col)
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(g.orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        ))
    ).withColumn("n_total", _ppm_guarded_total(F.sum("cnt").over(g)))
    probs = spark.createDataFrame(
        [(int(p),) for p in probs_ppm], "p_ppm bigint"
    )
    hit = cum.crossJoin(F.broadcast(probs)).filter(
        F.col("cum") * F.lit(1_000_000) >= F.col("p_ppm") * F.col("n_total")
    )
    return hit.groupBy(group_col, "p_ppm").agg(
        (F.min("bin") * F.lit(bin_width)).cast("long").alias("est_lo"),
        (F.min("bin") * F.lit(bin_width) + F.lit(bin_width - 1))
        .cast("long")
        .alias("est_hi"),
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise max over any number of register tables — the shard
    combine.  union + one m-key groupBy; output is again a full
    register table."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, buckets: int = 256, rho_cap: int = 40
) -> DataFrame:
    """One row (m, v_empty, s_scaled, est_distinct): the raw HLL
    estimate, integer-exact.

    S = sum 2^(rho_cap - rho) over all m registers (int64: m * 2^cap
    <= 2^48 at defaults); raw harmonic term q = (m^2 * 2^cap) div S;
    estimate = (alpha_ppm * q) div 10^6.  The alpha multiply is guarded:
    q beyond 2^62/alpha means cardinality past ~10^13 — the job FAILS
    (assert_true) rather than silently wrapping; shard the key space or
    raise ``buckets`` there."""
    alpha = _hll_alpha_ppm(buckets)
    m2c = buckets * buckets * (1 << rho_cap)
    q_budget = (1 << 62) // alpha
    agg = registers.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_cap} - rho)")
        ).alias("s_scaled"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_empty"),
        F.count("*").alias("m"),
    )
    q = agg.withColumn(
        "__q", F.expr(f"CAST({m2c} AS BIGINT) div s_scaled")
    ).withColumn(
        "__qc",
        F.when(
            F.assert_true(
                F.col("__q") < F.lit(q_budget),
                F.lit(
                    "hll_estimate: harmonic term exceeds the int64 alpha "
                    "budget (cardinality ~10^13+); raise buckets or "
                    "shard the key space"
                ),
            ).isNull(),
            F.col("__q"),
        ),
    )
    return q.select(
        F.col("m").cast("long").alias("m"),
        "v_empty",
        F.col("s_scaled").cast("long").alias("s_scaled"),
        # v_empty == m means literally zero keys were seen: cardinality
        # is EXACTLY 0, not an estimate (the one small-range case that
        # needs no ln-based correction)
        F.expr(
            "CAST(CASE WHEN v_empty = m THEN 0 "
            f"ELSE ({alpha} * __qc) div 1000000 END AS BIGINT)"
        ).alias("est_distinct"),
    )
