"""The flagship extraction pipeline: DataFrame plan over interleaved documents.

Spark-first layout (SURVEY.md §3.1 "Spark lifecycle equivalent"):

    read -> cheap JVM prefilter (P1 pushdown-able, whole-stage codegen)
         -> salted repartition on hash(doc_id, salt)   (skew defusal, §4)
         -> ONE vectorized pandas UDF (Arrow batches) running the pure kernel
         -> inline() explode of the returned span array  (order is data, O2)
         -> metrics side-channel as plain columns (S8/A1/A2 aggregate later)

Everything outside the kernel stays JVM-side; there are no per-row Python
UDFs (BASELINE.json:input_hint) and no RDDs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.document import extract_document
from ..operators.repartition import salted_repartition

# ---- schemas (FIXTURES.md §1 input / §2 output) ---------------------------

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)

OUT_SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType(), False),
    ]
)

METRIC_FIELDS = (
    "tables_num",
    "tables_analyzed",
    "no_headers",
    "no_data",
    "headers_not_resolved",
    "rows_extracted",
    "data_extracted",
    "data_extracted_to_map",
    "triples_row",
    "kernel_errors",
)

METRICS_STRUCT = StructType([StructField(f, LongType(), False) for f in METRIC_FIELDS])

PARSED_STRUCT = StructType(
    [
        StructField("out_spans", ArrayType(OUT_SPAN_STRUCT), False),
        StructField("metrics", METRICS_STRUCT, False),
    ]
)


def _coerce_spans(value) -> list:
    """Arrow hands array<struct> to pandas as a sequence of dicts (or Rows)."""
    if value is None:
        return []
    out = []
    for item in value:
        if isinstance(item, dict):
            out.append(item)
        else:  # pyspark Row or similar mapping
            out.append(item.asDict())
    return out


@F.pandas_udf(PARSED_STRUCT)
def parse_documents_udf(doc_id: pd.Series, spans: pd.Series) -> pd.DataFrame:
    """Vectorized kernel stage: Series[spans] -> Series[(out_spans, metrics)].

    Pure function of one document — embarrassingly parallel; Arrow-batched
    (SURVEY §2.9).  Tuples (not dicts) for the span structs keep the
    Arrow conversion cheap.
    """
    out_spans = []
    out_metrics = []
    for did, sp in zip(doc_id, spans):
        rows, metrics = extract_document(did, _coerce_spans(sp))
        out_spans.append(rows)
        out_metrics.append({f: metrics[f] for f in METRIC_FIELDS})
    return pd.DataFrame({"out_spans": out_spans, "metrics": out_metrics})


def table_prefilter() -> Column:
    """P1 cheap prefilter: skip documents with no ``<table`` anywhere.

    Runs JVM-side (whole-stage codegen) BEFORE the Python stage, so table-less
    docs never cross the Arrow boundary — the Spark equivalent of the
    reference's early "No tables found" exit (HtmlTableParser.py:118-121).
    """
    return F.exists(
        "spans",
        lambda s: F.lower(F.coalesce(s["text"], F.lit(""))).contains("<table"),
    )


def parse_stage(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) -> (doc_id, out_spans, metrics) via the kernel UDF."""
    return docs.select(
        "doc_id", parse_documents_udf("doc_id", "spans").alias("parsed")
    ).select("doc_id", "parsed.out_spans", "parsed.metrics")


def extract_pipeline(
    docs: DataFrame,
    *,
    num_partitions: Optional[int] = None,
    salt: int = 0,
    prefilter: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """Assemble the full plan; returns ``(out_spans_df, metrics_df)``.

    out_spans_df: (doc_id, kind, text, media_ref, order) — one row per output
    span; exact per-document sequences under ``order`` (never rely on row
    order across the shuffle — O2: order is data).

    metrics_df: (doc_id, <counter columns>) — per-document lineage/metrics
    feed (S8); aggregate with ``plans.metrics.report``.

    NOTE on reuse: the two returned frames share the parse stage.  Run-once
    jobs should ``parsed.persist()`` or write the parse output to a table and
    branch from there — at 10^12-doc scale always write-then-branch.
    """
    if prefilter:
        docs = docs.filter(table_prefilter())
    docs = salted_repartition(docs, num_partitions=num_partitions, salt=salt)
    parsed = parse_stage(docs)
    out = parsed.select("doc_id", F.inline("out_spans"))
    metrics = parsed.select("doc_id", "metrics.*")
    return out, metrics
