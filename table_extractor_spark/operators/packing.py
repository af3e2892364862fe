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
