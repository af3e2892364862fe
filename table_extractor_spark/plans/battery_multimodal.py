"""D. Multimodal column queries: binary blobs + typed metadata (operators/multimodal).

Split out of plans/queries.py in round 6 — same registrations, same
oracle pairing, same engine-parity rules (see the plans/queries.py
module docstring); the @register calls execute when plans/queries.py
imports this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..sources.tables import load_table
from .registry import register

# ===========================================================================
# D. multimodal columns (binary blobs + typed metadata; decode stubbed with a
#    deterministic fake container, Spark plumbing real — operators/multimodal)
# ===========================================================================

from ..operators import multimodal as M  # noqa: E402


@register(
    "media_metadata",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'img://' || CAST(doc_id AS VARCHAR) || '/0.jpg' AS media_ref,
       'IMG1' AS format,
       CAST(doc_id % 64 + 16 AS INT) AS width,
       CAST(doc_id % 48 + 9 AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       TRUE AS valid
FROM documents
""",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode -> typed metadata via mapInPandas (stubbed codec,
    real Arrow/binary plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_metadata(M.synthesize_media(docs))


_DUCK_HBINS = ", ".join(
    "CAST(len(list_filter(codes, x -> x = {i})) AS BIGINT) AS h{i}".format(i=i)
    for i in range(16)
)


@register(
    "media_byte_histogram",
    oracle=f"""
WITH c AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '.'),
                                ch -> ascii(ch) % 16) AS codes
  FROM documents WHERE doc_id < 100
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'img://' || CAST(doc_id AS VARCHAR) || '/0.jpg' AS media_ref,
       {_DUCK_HBINS}
FROM c
""",
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: numpy-vectorized byte
    histogram per Arrow batch (the batch shape a model forward pass uses)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return M.byte_histogram_features(M.synthesize_media(docs))


@register(
    "media_resize_plan",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(5 + 2 + 1 + 2 + 1 + octet_length(encode(text)) AS BIGINT)
         AS content_bytes
FROM documents WHERE doc_id < 100
""",
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stub: binary-in/binary-out mapInPandas; the oracle checks the
    rewritten container size ('IMG1:' + '32:' + '24:' + payload)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    resized = M.resize_stub(M.synthesize_media(docs), width=32, height=24)
    return resized.select(
        "doc_id", F.octet_length("content").cast("long").alias("content_bytes")
    )


@register(
    "media_frame_sample",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST((octet_length(encode(text)) + 3) // 4 AS INT) AS n_frames
FROM documents WHERE doc_id < 100
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling stub: strided payload read, every 4th byte."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return M.frame_sample_stub(M.synthesize_media(docs), every=4).select(
        "doc_id", "n_frames"
    )


@register(
    "pdf_page_extract",
    oracle="""
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 200
), pages AS (
  SELECT doc_id, 0 AS page_no, 'Intro ' || doc_id AS title,
         coalesce(array_to_string(w[1:12], ' '), '') AS body FROM w
  UNION ALL
  SELECT doc_id, 1, 'Details ' || doc_id,
         coalesce(array_to_string(w[13:24], ' '), '') FROM w
)
SELECT doc_id, 'pdf://' || doc_id || '/doc.pdf' AS media_ref,
       CAST(page_no AS INT) AS page_no, title, body,
       CAST(len(string_split(title || ' ' || body, ' '))
            - CASE WHEN body = '' THEN 1 ELSE 0 END AS INT) AS n_words
FROM pages
""",
)
def pdf_page_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout parse path (stubbed codec, real plumbing): binary PDF
    containers -> exploded per-page rows with the first-line-as-heading
    layout heuristic, one mapInPandas, poison blobs skipped."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return M.parse_pdf_pages(M.synthesize_pdfs(docs))


@register(
    "media_embedding_topk",
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch) % 16)
           AS codes
  FROM documents WHERE doc_id < 200
), h AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        b -> CAST(len(list_filter(codes, x -> x = b))
                                  AS DOUBLE)) AS hist
  FROM c
), v AS (
  SELECT CAST(doc_id AS VARCHAR) AS vid, doc_id AS did,
         list_transform(
           hist,
           x -> x / sqrt(list_sum(list_transform(hist, y -> y * y)))) AS e
  FROM h
), q AS (SELECT * FROM v WHERE did < 5),
sims AS (
  SELECT q.vid AS query_id, v.vid AS neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.e)),
                                   i -> q.e[i] * v.e[i]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
           AS cos_sim
  FROM q, v WHERE q.vid <> v.vid
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
""",
)
def media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline composition: binary media -> embedding
    model stub (numpy batch per Arrow batch, array<double> out) -> exact
    cosine top-k.  The decode/embed step runs BEFORE any shuffle — only the
    16-double vectors cross the wire, never the blobs; the oracle recomputes
    the embeddings from the synthesized payload in pure SQL."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    emb = M.embed_stub(M.synthesize_media(docs)).select("doc_id", "embedding")
    queries_df = emb.filter(F.col("doc_id").cast("int") < 5)
    return S.brute_force_topk(
        emb, queries_df, k=3, id_col="doc_id", vec_col="embedding"
    )
