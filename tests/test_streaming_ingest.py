"""Structured Streaming ingest: AvailableNow drains new files exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.plans.extract import extract_pipeline
from table_extractor_spark.sources.tables import fixture_corpus_df
from table_extractor_spark.streaming.ingest import run_available_now


def spans_by_doc(df):
    by_doc: dict = {}
    for r in df.collect():
        by_doc.setdefault(r.doc_id, []).append((r.kind, r.text, r.media_ref, r.order))
    for v in by_doc.values():
        v.sort(key=lambda s: s[3])
    return by_doc


def test_available_now_incremental_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs1 = fixture_corpus_df(spark, copies=2).filter(
        F.col("doc_id").endswith("_c0")
    )
    docs2 = fixture_corpus_df(spark, copies=2).filter(
        F.col("doc_id").endswith("_c1")
    )

    # batch 1 lands -> drain
    docs1.write.mode("append").parquet(inp)
    run_available_now(spark, inp, out, ckpt, num_partitions=4)
    got1 = spans_by_doc(spark.read.parquet(out))
    exp1, _ = extract_pipeline(docs1, num_partitions=4)
    assert got1 == spans_by_doc(exp1)

    # batch 2 lands -> drain again: ONLY the new files are processed, prior
    # output is untouched (exactly-once via the stream checkpoint)
    docs2.write.mode("append").parquet(inp)
    run_available_now(spark, inp, out, ckpt, num_partitions=4)
    got = spans_by_doc(spark.read.parquet(out))
    both = docs1.unionByName(docs2)
    exp, _ = extract_pipeline(both, num_partitions=4)
    assert got == spans_by_doc(exp)

    # a third drain with nothing new is a no-op (no duplicated rows)
    run_available_now(spark, inp, out, ckpt, num_partitions=4)
    assert spark.read.parquet(out).count() == sum(len(v) for v in got.values())


def test_available_now_with_metrics_single_parse(spark, tmp_path):
    """foreachBatch two-sink path: spans AND per-doc metrics from one parse
    per micro-batch; metrics totals equal the batch pipeline's."""
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    met = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    docs = fixture_corpus_df(spark, copies=2)
    docs.write.parquet(inp)
    run_available_now(spark, inp, out, ckpt, metrics_dir=met, num_partitions=4)

    got_spans = spans_by_doc(spark.read.parquet(out))
    exp_out, exp_metrics = extract_pipeline(docs, num_partitions=4)
    assert got_spans == spans_by_doc(exp_out)

    got_m = spark.read.parquet(met)
    exp_rows = {r.doc_id: r.rows_extracted for r in exp_metrics.collect()}
    got_rows = {r.doc_id: r.rows_extracted for r in got_m.collect()}
    assert got_rows == exp_rows


def test_two_sink_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id) must REPLACE its own partition,
    not append a duplicate — simulated by invoking the per-batch writer
    twice with the same id."""
    from table_extractor_spark.streaming import ingest as I
    from pyspark.sql import functions as F
    from table_extractor_spark.operators.repartition import salted_repartition
    from table_extractor_spark.plans.extract import (
        METRIC_FIELDS, OUT_COLUMNS, parse_stage, table_prefilter)

    out = str(tmp_path / "out")
    met = str(tmp_path / "met")
    docs = fixture_corpus_df(spark, copies=1)

    def write_both(batch_df, batch_id):
        # mirror of the ingest writer (module-internal closure, so re-build)
        filtered = batch_df.filter(table_prefilter())
        spread = salted_repartition(filtered.select("doc_id", "spans"),
                                    num_partitions=4)
        parsed = parse_stage(spread).withColumn(
            "batch_id", F.lit(int(batch_id))).persist()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            parsed.filter(F.col("kind").isNotNull()).select(
                *OUT_COLUMNS, "batch_id").write.mode("overwrite").partitionBy(
                "batch_id").parquet(out)
            parsed.filter(F.col("kind").isNull()).select(
                "doc_id", *METRIC_FIELDS, "batch_id").write.mode(
                "overwrite").partitionBy("batch_id").parquet(met)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            parsed.unpersist()

    write_both(docs, 0)
    n1 = spark.read.parquet(out).count()
    write_both(docs, 0)  # "retry"
    assert spark.read.parquet(out).count() == n1
    write_both(docs, 1)  # a genuinely new batch appends its own partition
    assert spark.read.parquet(out).count() == 2 * n1


def test_stream_near_dup_dedup_standing_index(spark, tmp_path):
    """Two AvailableNow drains: batch 1 seeds the index (collapsing its own
    internal near-dups); batch 2's near-dup of a batch-1 survivor is
    dropped by the standing index, its fresh docs pass."""
    import os

    from table_extractor_spark.streaming.ingest import (
        start_stream_near_dup_dedup,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckp = str(tmp_path / "ckp")
    os.makedirs(inp)

    base = " ".join(f"tok{i}" for i in range(30))

    def land(name, rows):
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.mode("append").parquet(inp)

    # batch 1: a + its near-dup b (collapse to a), plus distinct c
    land("b1", [
        ("doc_a", base + " ending one"),
        ("doc_b", base + " ending two"),
        ("doc_c", " ".join(f"other{i}" for i in range(30))),
    ])
    start_stream_near_dup_dedup(spark, inp, out, idx, ckp)
    kept1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept1 == {"doc_a", "doc_c"}

    # batch 2: near-dup of doc_a (standing-index hit) + a fresh doc
    land("b2", [
        ("doc_d", base + " ending three"),
        ("doc_e", " ".join(f"fresh{i}" for i in range(30))),
    ])
    start_stream_near_dup_dedup(spark, inp, out, idx, ckp)
    kept2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept2 == {"doc_a", "doc_c", "doc_e"}

    # the standing index holds exactly the survivors, in BOTH parts
    index_docs = {
        r.doc_id
        for r in spark.read.parquet(idx + "/buckets")
        .select("doc_id").distinct().collect()
    }
    assert index_docs == {"doc_a", "doc_c", "doc_e"}
    # texts are stored ONCE per doc (no band multiplication, so the verify
    # stage never needs a per-batch distinct() over the standing index)
    text_rows = spark.read.parquet(idx + "/texts").select("doc_id").collect()
    assert sorted(r.doc_id for r in text_rows) == ["doc_a", "doc_c", "doc_e"]


def test_ngram_jaccard_verify_scan_is_candidate_pruned(spark):
    """The verify stage's text-side scan must read O(candidates), not
    O(corpus): ngram_jaccard semi-joins the candidate id set into the text
    side BEFORE shingling (visible as a LeftSemi join in the optimized
    plan), and its output only ever touches candidate ids."""
    from table_extractor_spark.operators.dedup import (
        ngram_containment,
        ngram_jaccard,
    )

    docs = spark.createDataFrame(
        [(f"doc_{i}", " ".join(f"w{i}_{j}" for j in range(20)))
         for i in range(200)],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("doc_1", "doc_2"), ("doc_1", "doc_3")], "a string, b string"
    )
    for fn in (ngram_jaccard, ngram_containment):
        out = fn(docs, pairs)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in plan, f"{fn.__name__} lost the candidate prune"
        got = {r.a for r in out.collect()} | {r.b for r in out.collect()}
        assert got <= {"doc_1", "doc_2", "doc_3"}


def test_torn_standing_index_fails_batch(spark, tmp_path):
    """If exactly one of the index's buckets/texts tables has rows outside
    the current batch, the micro-batch must FAIL (streaming retry re-runs
    it) rather than silently skip corpus dedup — a torn index admitted
    duplicates permanently under the old bare-except behavior."""
    import os
    import shutil

    import pytest

    from table_extractor_spark.streaming.ingest import (
        start_stream_near_dup_dedup,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckp = str(tmp_path / "ckp")
    os.makedirs(inp)

    spark.createDataFrame(
        [("doc_a", " ".join(f"tok{i}" for i in range(30)))],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(inp)
    start_stream_near_dup_dedup(spark, inp, out, idx, ckp)
    assert spark.read.parquet(idx + "/texts").count() == 1

    # tear the index: texts gone, buckets (with batch-0 rows) remain
    shutil.rmtree(idx + "/texts")
    spark.createDataFrame(
        [("doc_b", " ".join(f"other{i}" for i in range(30)))],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(inp)
    from pyspark.errors import StreamingQueryException

    with pytest.raises((RuntimeError, StreamingQueryException)) as exc:
        start_stream_near_dup_dedup(spark, inp, out, idx, ckp)
    assert "torn" in str(exc.value)


def test_compact_near_dup_index_preserves_dedup(spark, tmp_path):
    """Compaction rewrites each index partition to one file with rows
    verbatim: file counts drop, contents are identical, and a post-
    compaction batch still dedups against the standing index."""
    import glob
    import os

    from table_extractor_spark.streaming.ingest import (
        compact_near_dup_index,
        start_stream_near_dup_dedup,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckp = str(tmp_path / "ckp")
    os.makedirs(inp)

    base = " ".join(f"tok{i}" for i in range(30))

    def land(rows):
        # several input files -> several write tasks -> several index files
        spark.createDataFrame(
            rows, "doc_id string, text string"
        ).repartition(4).write.mode("append").parquet(inp)

    land([(f"doc_{j}", " ".join(f"w{j}_{i}" for i in range(30)))
          for j in range(8)] + [("doc_a", base + " ending one")])
    start_stream_near_dup_dedup(spark, inp, out, idx, ckp)

    def texts_files():
        return glob.glob(f"{idx}/texts/batch_id=*/*.parquet")

    def snapshot():
        return sorted(
            tuple(r) for r in spark.read.parquet(idx + "/texts")
            .select("doc_id", "text").collect()
        )

    # fragment the batch partition the way a LARGE batch write would (one
    # file per write task): rewrite the same rows from 4 tasks
    frag = spark.read.parquet(idx + "/texts").repartition(4).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        frag.write.mode("overwrite").partitionBy("batch_id").parquet(
            idx + "/texts"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    before_rows, before_files = snapshot(), len(texts_files())
    assert before_files > 1
    compact_near_dup_index(spark, idx)
    assert len(texts_files()) == 1
    assert snapshot() == before_rows

    # a later batch still dedups against the compacted standing index
    land([("doc_dup", base + " ending two"),
          ("doc_new", " ".join(f"fresh{i}" for i in range(30)))])
    start_stream_near_dup_dedup(spark, inp, out, idx, ckp)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert "doc_new" in kept and "doc_dup" not in kept


def test_stream_decontamination_quarantines_benchmark_overlap(spark, tmp_path):
    """Two AvailableNow drains: docs sharing a 3-gram with the static
    benchmark land in quarantine WITH collision counts; clean docs pass.
    Both sinks are batch_id-partitioned for retry idempotence."""
    import os

    from pyspark.sql import functions as F

    from table_extractor_spark.streaming.ingest import (
        start_stream_decontamination,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    quar = str(tmp_path / "quar")
    ckp = str(tmp_path / "ckp")
    os.makedirs(inp)

    bench = spark.createDataFrame(
        [("bench_1", "the secret benchmark answer is forty two exactly")],
        "doc_id string, text string",
    )

    def land(rows):
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.mode("append").parquet(inp)

    land([
        ("d_leak", "prefix words the secret benchmark answer appears here"),
        ("d_ok", "completely unrelated text about other things entirely"),
    ])
    start_stream_decontamination(
        spark, inp, out, quar, bench, ckp, timeout_sec=120
    )
    land([
        ("d_leak2", "another doc where the benchmark answer is forty two"),
        ("d_ok2", "more clean content with no overlap whatsoever present"),
    ])
    start_stream_decontamination(
        spark, inp, out, quar, bench, ckp, timeout_sec=120
    )

    clean = {r.doc_id for r in spark.read.parquet(out).collect()}
    qrows = {
        r.doc_id: (r.n_collisions, r.batch_id)
        for r in spark.read.parquet(quar).collect()
    }
    assert clean == {"d_ok", "d_ok2"}
    assert set(qrows) == {"d_leak", "d_leak2"}
    # collision counts are real distinct-gram counts, not just flags
    assert qrows["d_leak"][0] >= 2 and qrows["d_leak2"][0] >= 2
    # batch lineage: each quarantined doc carries the batch that caught it
    assert qrows["d_leak"][1] == 0 and qrows["d_leak2"][1] == 1
    # clean sink schema keeps (doc_id, text, batch_id) — downstream-ready
    cols = set(spark.read.parquet(out).columns)
    assert cols == {"doc_id", "text", "batch_id"}


def test_stream_dim_enrich_rereads_dim_per_batch(spark, tmp_path):
    """Stream-static enrichment: batch 1 joins dim v1 (u2 unknown ->
    NULL, kept by the LEFT join); the dimension is then OVERWRITTEN and
    batch 2 must see v2 without a restart — the static side re-resolves
    every micro-batch."""
    import datetime as dt

    from table_extractor_spark.streaming.ingest import start_stream_dim_enrich

    inp = str(tmp_path / "in")
    dim = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def _events(rows):
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string",
        ).coalesce(1).write.mode("append").parquet(inp)

    def _dim(rows):
        spark.createDataFrame(
            rows, "user_id bigint, segment string"
        ).coalesce(1).write.mode("overwrite").parquet(dim)

    _dim([(1, "gold")])
    _events([(1, t0, 1, "view"), (2, t0, 2, "view")])
    start_stream_dim_enrich(spark, inp, dim, out, ckpt).awaitTermination()
    got1 = {
        (r["event_id"], r["segment"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {(1, "gold"), (2, None)}

    _dim([(1, "gold"), (2, "silver")])
    _events([(3, t0, 2, "click")])
    start_stream_dim_enrich(spark, inp, dim, out, ckpt).awaitTermination()
    got2 = {
        (r["event_id"], r["segment"])
        for r in spark.read.parquet(out).collect()
    }
    # batch-1 rows keep their values; the new event sees dim v2
    assert got2 == {(1, "gold"), (2, None), (3, "silver")}
