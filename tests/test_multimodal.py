"""Multimodal operator tests: fake-container decode, hostile blobs, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from table_extractor_spark.operators import multimodal as M


def test_parse_fake_header_hostile():
    assert M.parse_fake_header(None) == ("", 0, 0, 0, False)
    assert M.parse_fake_header(b"") == ("", 0, 0, 0, False)
    assert M.parse_fake_header(b"JPEG\xff\xd8") == ("", 0, 0, 6, False)
    assert M.parse_fake_header(b"IMG1:nope") == ("IMG1", 0, 0, 0, False)
    assert M.parse_fake_header(b"IMG1:x:2:abc") == ("IMG1", 0, 0, 0, False)
    assert M.parse_fake_header(b"IMG1:4:3:abcd") == ("IMG1", 4, 3, 4, True)
    # payload containing ':' is not re-split
    assert M.parse_fake_header(b"IMG1:4:3:a:b:c") == ("IMG1", 4, 3, 5, True)


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"IMG1:1:1:x")


def test_decode_metadata_and_hostile_rows(spark):
    media = spark.createDataFrame(
        [
            ("d1", "img://d1/0", bytearray(b"IMG1:10:5:hello")),
            ("d2", "img://d2/0", bytearray(b"garbage")),
            ("d3", "img://d3/0", None),
        ],
        "doc_id string, media_ref string, content binary",
    )
    rows = {r.doc_id: r for r in M.decode_metadata(media).collect()}
    assert (rows["d1"].width, rows["d1"].height, rows["d1"].payload_bytes,
            rows["d1"].valid) == (10, 5, 5, True)
    assert rows["d2"].valid is False and rows["d2"].payload_bytes == 7
    assert rows["d3"].valid is False and rows["d3"].payload_bytes == 0


def test_histogram_resize_framesample_roundtrip(spark):
    media = spark.createDataFrame(
        [("d1", "m1", bytearray(b"IMG1:2:2:" + bytes(range(32))))],
        "doc_id string, media_ref string, content binary",
    )
    hist = M.byte_histogram_features(media).collect()[0]
    assert [hist[f"h{i}"] for i in range(16)] == [2] * 16  # 0..31 -> 2 per bin

    resized = M.resize_stub(media, 7, 9).collect()[0]
    assert bytes(resized.content).startswith(b"IMG1:7:9:")
    assert bytes(resized.content)[9:] == bytes(range(32))

    frames = M.frame_sample_stub(media, every=4).collect()[0]
    assert frames.n_frames == 8
    assert bytes(frames.frames) == bytes(range(0, 32, 4))


def test_media_pipeline_no_shuffle(spark):
    """Blob stages must not shuffle: decode/feature plans are scan->python."""
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("word word").alias("text")
    )
    plan = (
        M.decode_metadata(M.synthesize_media(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_embed_stub_unit_norm_and_poison_blob(spark):
    """Embedding stub: valid blobs yield unit-L2 array<double> vectors;
    malformed blobs yield NULL (never raise — a poison blob at 10^12 docs
    must not kill the task)."""
    from table_extractor_spark.operators.multimodal import embed_stub

    media = spark.createDataFrame(
        [
            ("a", "img://a", bytearray(b"IMG1:4:3:hello world payload")),
            ("b", "img://b", bytearray(b"NOT_A_CONTAINER")),
            ("c", "img://c", None),
        ],
        "doc_id string, media_ref string, content binary",
    )
    rows = {r.doc_id: r.embedding for r in embed_stub(media).collect()}
    assert rows["b"] is None and rows["c"] is None
    v = rows["a"]
    assert len(v) == 16
    assert abs(sum(x * x for x in v) - 1.0) < 1e-12


def test_pdf_parse_explodes_pages_and_skips_poison(spark):
    from table_extractor_spark.operators.multimodal import parse_pdf_pages

    media = spark.createDataFrame(
        [
            ("a", "pdf://a", bytearray(b"PDF1:Title A\nbody words here\x0cPage Two\nmore text")),
            ("b", "pdf://b", bytearray(b"NOT_A_PDF")),
            ("c", "pdf://c", None),
        ],
        "doc_id string, media_ref string, content binary",
    )
    rows = parse_pdf_pages(media).collect()
    assert sorted((r.doc_id, r.page_no) for r in rows) == [("a", 0), ("a", 1)]
    p0 = next(r for r in rows if r.page_no == 0)
    assert p0.title == "Title A" and p0.body == "body words here"
    assert p0.n_words == 5
