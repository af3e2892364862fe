"""JSONL/CSV document sources: schema enforcement + no-silent-drop
corrupt-record accounting."""

from __future__ import annotations

import json
import os

from table_extractor_spark.sources.text_formats import (
    load_documents_csv,
    load_documents_jsonl,
)


def _write(path, lines):
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_jsonl_good_and_bad_accounted(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    good_lines = [
        json.dumps({"doc_id": i, "text": f"t {i}", "lang": "en",
                    "source": "s", "n_chars": 3})
        for i in range(10)
    ]
    bad_lines = ['{"doc_id": 99, "text": "truncated', "not json at all"]
    _write(p, good_lines[:5] + bad_lines[:1] + good_lines[5:] + bad_lines[1:])

    good, bad = load_documents_jsonl(spark, p)
    assert good.count() == 10
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]
    assert dict(good.dtypes)["doc_id"] == "bigint"
    # every malformed line is preserved VERBATIM, never silently dropped
    raws = sorted(r.raw_record for r in bad.collect())
    assert raws == sorted(bad_lines)
    # parsed values round-trip
    got = {r.doc_id: r.text for r in good.collect()}
    assert got[3] == "t 3"


def test_csv_good_and_bad_accounted(spark, tmp_path):
    p = str(tmp_path / "docs.csv")
    rows = ["doc_id,text,lang,source,n_chars"]
    rows += [f'{i},"line {i}",en,s,6' for i in range(8)]
    rows += ['notanint,"bad id",en,s,6']  # type violation -> corrupt
    _write(p, rows)

    good, bad = load_documents_csv(spark, p)
    assert good.count() == 8
    assert bad.count() == 1
    assert "notanint" in bad.collect()[0].raw_record
    got = {r.doc_id: r.text for r in good.collect()}
    assert got[2] == "line 2"


def test_jsonl_feeds_the_standard_pipeline(spark, tmp_path):
    """The loaded frame drops straight into the existing operator surface
    (same documents schema): token counting runs unchanged."""
    from pyspark.sql import functions as F

    from table_extractor_spark.functions.text import token_count

    p = str(tmp_path / "docs.jsonl")
    _write(p, [
        json.dumps({"doc_id": i, "text": "a b c", "lang": "en",
                    "source": "s", "n_chars": 5})
        for i in range(4)
    ])
    good, _ = load_documents_jsonl(spark, p)
    out = good.select(token_count(F.col("text")).alias("n_tokens"))
    assert {r.n_tokens for r in out.collect()} == {3}


def test_jsonl_disk_only_storage_level(spark, tmp_path):
    """The corpus-scale storage dial: DISK_ONLY persists must yield the
    identical (good, bad) split — and actually carry the requested level."""
    from pyspark.storagelevel import StorageLevel

    p = str(tmp_path / "docs_disk.jsonl")
    lines = [
        json.dumps({"doc_id": i, "text": f"t {i}", "lang": "en",
                    "source": "s", "n_chars": 3})
        for i in range(4)
    ] + ["broken {"]
    _write(p, lines)

    good, bad = load_documents_jsonl(
        spark, p, storage_level=StorageLevel.DISK_ONLY
    )
    assert good.count() == 4
    assert bad.count() == 1
    # the persisted parse really is disk-only (no executor-memory cache)
    plan = good._jdf.queryExecution().optimizedPlan().toString()
    assert "StorageLevel(disk, 1 replicas)" in plan


def test_write_jsonl_sharded_bounds_file_size_and_round_trips(spark, tmp_path):
    import glob

    from table_extractor_spark.sources.text_formats import (
        load_documents_jsonl,
        write_jsonl_sharded,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = str(tmp_path / "export")
    write_jsonl_sharded(docs, out, max_records_per_file=20)
    files = glob.glob(f"{out}/part-*")
    assert files, "no shard files written"
    # bounded: no file may exceed the record cap
    for f in files:
        with open(f) as fh:
            assert sum(1 for _ in fh) <= 20
    # round-trip through the quarantine reader: all good, none bad
    good, bad = load_documents_jsonl(spark, out)
    assert good.count() == n and bad.count() == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in good.select(*docs.columns).collect()}
    assert a == b


def test_write_jsonl_sharded_partitions_by_column(spark, tmp_path):
    import os

    from table_extractor_spark.sources.text_formats import (
        write_jsonl_sharded,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    write_jsonl_sharded(docs, out, partition_cols=("lang",))
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    got = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("lang=")
    }
    assert got == langs
    # partition-pruned read sees only that language
    en = spark.read.json(f"{out}/lang=en")
    assert en.count() == docs.filter("lang = 'en'").count()


def test_orc_round_trip(spark, tmp_path):
    from table_extractor_spark.sources.text_formats import (
        load_documents_orc,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "orc")
    docs.write.orc(out)
    back = load_documents_orc(spark, out)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in docs.collect()
    }
