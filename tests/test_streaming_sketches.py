"""Standing HLL registers on ingest: batch merge == whole-stream sketch,
retry idempotence via partition overwrite, lossless compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators.sketches import hll_estimate, hll_sketch
from table_extractor_spark.streaming.sketches import (
    _word_keys,
    compact_hll_registers,
    standing_hll_estimate,
    start_stream_distinct_count,
)


def _docs(spark, lo, hi):
    # doc i contributes words w_{i}..w_{i+4}: overlapping vocab across docs
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), (F.col("id") + i).cast("string"))
                for i in range(5)
            ],
        ).alias("text"),
    )


def _drain(spark, inp, reg, ckpt):
    q = start_stream_distinct_count(spark, inp, reg, ckpt)
    q.awaitTermination(120)


def test_standing_estimate_tracks_the_stream(spark, tmp_path):
    inp = str(tmp_path / "landing")
    reg = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, 0, 300).write.mode("append").parquet(inp)
    _drain(spark, inp, reg, ckpt)
    est1 = standing_hll_estimate(spark, reg).collect()[0]
    whole1 = hll_estimate(hll_sketch(_word_keys(_docs(spark, 0, 300)))).collect()[0]
    assert est1.est_distinct == whole1.est_distinct

    # second batch lands: the standing estimate must equal the sketch of
    # the UNION of both batches — bucket-wise max across partitions
    _docs(spark, 300, 700).write.mode("append").parquet(inp)
    _drain(spark, inp, reg, ckpt)
    est2 = standing_hll_estimate(spark, reg).collect()[0]
    whole2 = hll_estimate(hll_sketch(_word_keys(_docs(spark, 0, 700)))).collect()[0]
    assert est2.est_distinct == whole2.est_distinct
    # distinct words of docs 0..699 = w0..w703 -> 704; sigma ~ 6.5% at m=256
    assert abs(est2.est_distinct - 704) / 704 < 0.20

    # registers accrete one full m-row partition per non-empty batch
    raw = spark.read.parquet(reg)
    assert raw.groupBy("batch_id").count().collect()[0]["count"] == 256


def test_retried_batch_replaces_its_own_partition(spark, tmp_path):
    inp = str(tmp_path / "landing")
    reg = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, 0, 200).write.mode("append").parquet(inp)
    _drain(spark, inp, reg, ckpt)
    before = standing_hll_estimate(spark, reg).collect()[0]

    # simulate the at-least-once retry: re-run batch 0's write directly
    from table_extractor_spark.operators.sketches import hll_sketch as hs

    redo = hs(_word_keys(_docs(spark, 0, 200))).withColumn(
        "batch_id", F.lit(0)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        redo.write.mode("overwrite").partitionBy("batch_id").parquet(reg)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = standing_hll_estimate(spark, reg).collect()[0]
    assert (before.s_scaled, before.est_distinct) == (
        after.s_scaled,
        after.est_distinct,
    )
    # still exactly one partition's worth of rows for batch 0
    assert (
        spark.read.parquet(reg).filter(F.col("batch_id") == 0).count() == 256
    )


def test_compaction_is_lossless(spark, tmp_path):
    inp = str(tmp_path / "landing")
    reg = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, 0, 150).write.mode("append").parquet(inp)
    _drain(spark, inp, reg, ckpt)
    _docs(spark, 150, 400).write.mode("append").parquet(inp)
    _drain(spark, inp, reg, ckpt)

    before = standing_hll_estimate(spark, reg).collect()[0]
    compact_hll_registers(spark, reg)
    after = standing_hll_estimate(spark, reg).collect()[0]
    assert (before.s_scaled, before.v_empty, before.est_distinct) == (
        after.s_scaled,
        after.v_empty,
        after.est_distinct,
    )
    # exactly one merged partition of m rows remains, under the -1
    # sentinel no future stream batch can ever dynamic-overwrite
    raw = spark.read.parquet(reg)
    assert [r.batch_id for r in raw.select("batch_id").distinct().collect()] == [-1]
    assert raw.count() == 256

    # and a LATER stream whose batch ids restart at 0 (fresh checkpoint)
    # must extend the compacted history, not replace it
    ckpt2 = str(tmp_path / "ckpt2")
    inp2 = str(tmp_path / "landing2")
    _docs(spark, 400, 450).write.mode("append").parquet(inp2)
    q = start_stream_distinct_count(spark, inp2, reg, ckpt2)
    q.awaitTermination(120)
    est3 = standing_hll_estimate(spark, reg).collect()[0]
    whole3 = hll_estimate(
        hll_sketch(_word_keys(_docs(spark, 0, 450)))
    ).collect()[0]
    assert est3.est_distinct == whole3.est_distinct


# --- Standing count-min (additive merge law) ---------------------------------


def test_standing_countmin_tracks_stream_and_retry_replaces(spark, tmp_path):
    from table_extractor_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )
    from table_extractor_spark.streaming.sketches import (
        standing_countmin_estimate,
        start_stream_frequency_sketch,
    )

    inp = str(tmp_path / "landing")
    cells = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_stream_frequency_sketch(spark, inp, cells, ckpt)
        q.awaitTermination(120)

    _docs(spark, 0, 200).write.mode("append").parquet(inp)
    drain()
    _docs(spark, 200, 500).write.mode("append").parquet(inp)
    drain()

    probes = spark.createDataFrame(
        [("w0",), ("w250",), ("w499",)], ["key"]
    )
    got = {
        r.key: r.est_cnt
        for r in standing_countmin_estimate(spark, cells, probes).collect()
    }
    # whole-corpus single-batch sketch must estimate identically: the
    # per-batch SUM merge is exactly the whole-stream cell table
    from table_extractor_spark.streaming.sketches import _word_keys

    whole = countmin_sketch(_word_keys(_docs(spark, 0, 500)), width=1024)
    exp = {
        r.key: r.est_cnt
        for r in countmin_estimate(whole, probes, width=1024).collect()
    }
    assert got == exp
    # count-min never underestimates: w250 occurs in docs 246..250 -> 5
    assert got["w250"] >= 5

    # retry of batch 0: additive cells WOULD double-count; the partition
    # overwrite is what makes it idempotent
    redo = countmin_sketch(
        _word_keys(_docs(spark, 0, 200)), width=1024
    ).withColumn("batch_id", F.lit(0))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        redo.write.mode("overwrite").partitionBy("batch_id").parquet(cells)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = {
        r.key: r.est_cnt
        for r in standing_countmin_estimate(spark, cells, probes).collect()
    }
    assert after == exp
