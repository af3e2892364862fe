"""Sequence packing: deterministic assignment of documents to fixed-token
training sequences (the pre-training "packing" step — concatenate docs and
split every ``seq_len`` tokens; the packer's job is a reproducible
(doc -> sequence, offset) index, not the byte shuffle itself).

Spark shape for 10^12 docs: packing is inherently sequential WITHIN a
stream, so shard first — ``pmod(xxhash64(doc_id), n_shards)`` gives
uniform, content-stable shards — then one window per shard computes the
running token offset in a canonical (hash, doc_id) order.  One shuffle on
the shard key, integer-exact arithmetic end to end, so any engine (and the
SQL oracle) reproduces the exact same packing.  Readers stream a shard's
docs in (h, doc_id) order and cut every ``seq_len`` tokens; ``bin_id`` is
the sequence index the document STARTS in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_offset, bin_id): deterministic
    packing index.  ``start_offset`` is the running token offset of the doc
    within its shard's canonical order; ``bin_id = start_offset / seq_len``.
    """
    toks = F.size(F.split(F.col(text_col), " "))
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    # engine-agnostic H(doc_id) drives BOTH shard and in-shard order, so the
    # SQL oracle replays the identical packing bit for bit
    staged = docs.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
        h.alias("__h"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        "bin_id", F.floor(F.col("start_offset") / seq_len).cast("long")
    )


def chunk_documents(
    docs: DataFrame,
    seq_len: int = 512,
    stride: int = 384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, start_token, n_tokens, chunk_hash): sliding-window
    chunking of long documents into ``seq_len``-token windows every
    ``stride`` tokens (overlap = seq_len - stride) — the long-context
    training-prep step that SPLITS a document, complementing
    ``pack_sequences`` which CONCATENATES documents.  Every token is
    covered; the final window is allowed to be short (no padding here —
    padding is the packer's concern); ``chunk_hash`` is the md5 of the
    chunk text so the full payload never has to travel for audits.

    Tokens are NON-EMPTY whitespace tokens — doubled/trailing spaces do
    not count — matching the token accounting used by the dedup, BM25,
    and UniMax operators (a raw ``split`` would count empty strings and
    make chunk ``n_tokens`` disagree with the rest of the pipeline).

    Shape: chunk boundaries are pure per-row integer arithmetic over the
    token array (sequence -> transform -> explode), all JVM expressions —
    ZERO shuffles regardless of corpus size, and deterministic in any
    partitioning, so the SQL oracle replays every chunk bit-for-bit."""
    if seq_len < 1 or stride < 1:
        raise ValueError(f"seq_len and stride must be >= 1, got {seq_len}, {stride}")
    if stride > seq_len:
        raise ValueError(
            f"stride {stride} > seq_len {seq_len} would skip tokens"
        )
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n = F.size(toks)
    # windows start every `stride` tokens; the last start is the smallest
    # multiple of stride with start + seq_len >= n, so the tail is covered:
    # n_chunks = (max(n - seq_len, 0) + stride - 1) div stride + 1.
    # Column form (not an interpolated SQL string): reuses the one split
    # and works for any column name; floor-of-double is exact here since
    # token counts sit far below 2^53.
    num = F.greatest(n - F.lit(seq_len), F.lit(0)) + F.lit(stride - 1)
    n_chunks = (F.floor(num / F.lit(stride)) + 1).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                (i * stride).cast("long").alias("start_token"),
                F.least(F.lit(seq_len), n - i * stride)
                .cast("long")
                .alias("n_tokens"),
                F.md5(
                    F.array_join(
                        F.slice(toks, i * stride + 1, seq_len), " "
                    )
                ).alias("chunk_hash"),
            ),
        )
    )
    return docs.select(F.col(id_col), chunk.alias("c")).select(
        id_col, "c.chunk_idx", "c.start_token", "c.n_tokens", "c.chunk_hash"
    )


def assemble_shards(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    eod: str = "<|eod|>",
) -> DataFrame:
    """(shard, bin_id, shard_text, n_docs, n_tokens): the actual training
    shard payloads — each (shard, bin) concatenates its documents in the
    canonical packing order with an end-of-document separator.

    This is the writer stage on top of ``pack_sequences``: one join of the
    packing index back to the texts (hash join on the doc id; at corpus
    scale WRITE the index and sort-merge against the doc table instead)
    and one shuffle on (shard, bin).  Order inside a bin is by
    ``start_offset`` — unique within a shard and monotone in the canonical
    (hash, id) order — so the assembled text is deterministic whatever the
    partitioning; the array_sort-of-structs reassembly is the same
    engine-exact pattern ``paragraph_dedup`` uses."""
    idx = pack_sequences(docs, seq_len, n_shards, text_col, id_col)
    joined = idx.join(docs.select(id_col, text_col), id_col)
    return (
        joined.groupBy("shard", "bin_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_offset", text_col))
                    ),
                    lambda s: s.getField(text_col),
                ),
                eod,
            ).alias("shard_text"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def unimax_allocation(
    lang_counts: DataFrame,
    budget: int,
    max_epochs: int = 2,
    group_col: str = "lang",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Epoch-capped token-budget allocation across languages/domains —
    the integer-exact variant of UniMax (Chung et al., NeurIPS 2023):
    spread ``budget`` tokens as uniformly as possible over groups, except
    no group may be sampled beyond ``max_epochs`` passes over its
    ``count_col`` tokens (the repeat cap that stops mega-upsampling of
    tiny languages, the failure mode of plain temperature mixing).

    Greedy semantics (Algorithm 1 of the paper): visit groups in
    ascending (count, name) order; a group whose cap max_epochs*count is
    below its fair share of the remaining budget is allocated its cap;
    the rest split what remains.  Because counts ascend, the capped set
    is a PREFIX (the fair-share slack B - cumcap_{i-1} -
    cap_i*(L-i+1) is non-increasing in i), so one window pass decides
    every group independently — no driver-side loop.  Integer spec, so
    any engine reproduces it bit-for-bit: uncapped groups get
    q = R div n_uncapped each, and the first R mod n_uncapped of them
    (in the same sort order) get one extra token.

    Input is the GROUP-LEVEL count table (one row per language/domain —
    bounded cardinality), so the unpartitioned ordering window is a few
    hundred rows at worst; the corpus-sized aggregation that produces it
    stays partial-agg'd upstream.

    Returns (group, count, cap flag, allocated tokens, epochs_ppm) where
    epochs_ppm = 1e6 * alloc div count audits the realized repeat rate.
    """
    if budget < 0 or max_epochs < 1:
        raise ValueError("budget must be >= 0 and max_epochs >= 1")
    w = Window.orderBy(count_col, group_col)
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    sized = (
        lang_counts.select(group_col, count_col)
        .withColumn("__pos", F.row_number().over(w))
        .withColumn("__cap", F.col(count_col) * max_epochs)
        .withColumn(
            "__cumcap_prev", F.coalesce(F.sum("__cap").over(prev), F.lit(0))
        )
        .withColumn("__n", F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ))
        .withColumn(
            "capped",
            (F.lit(budget) - F.col("__cumcap_prev"))
            > F.col("__cap") * (F.col("__n") - F.col("__pos") + 1),
        )
    )
    # the capped set is a prefix: k* groups take their caps, the rest
    # split R = budget - sum(prefix caps) as q each plus r singles
    totals = sized.agg(
        F.count("*").alias("__L"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("__k"),
        F.sum(F.when(F.col("capped"), F.col("__cap")).otherwise(0)).alias(
            "__capsum"
        ),
    )
    return (
        sized.crossJoin(F.broadcast(totals))
        .withColumn("__R", F.lit(budget) - F.col("__capsum"))
        .withColumn("__nrem", F.col("__L") - F.col("__k"))
        .withColumn(
            "alloc_tokens",
            F.when(F.col("capped"), F.col("__cap")).otherwise(
                F.expr("__R div __nrem")
                + F.when(
                    F.col("__pos") - F.col("__k")
                    <= F.expr("__R % __nrem"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "epochs_ppm",
            # a zero-count group allocates 0 by its cap; NULL ppm keeps the
            # audit column honest instead of ANSI-erroring on the div
            F.when(
                F.col(count_col) > 0,
                F.expr(f"(1000000 * alloc_tokens) div {count_col}"),
            ).cast("long"),
        )
        .select(
            group_col,
            F.col(count_col).cast("long").alias(count_col),
            "capped",
            "alloc_tokens",
            "epochs_ppm",
        )
    )
