"""The pyDomainExplorer path: sections x headers inventory + settings sink.

The reference explorer (SURVEY §3.2) crawls a domain, collects every table's
(section, headers) pair, dedups headers, pre-fills ontology properties via
label lookup, and writes ``domain_settings.py`` — a fill-in-the-blanks file
the user edits into mapping rules (WriteSettingsFile.py:36-104).

Rebuilt Spark-first over the extraction output: the same parse kernel (run
with full depth — headers are a prefix of the span sequence), then pure
DataFrame aggregation.  At domain scale the inventory is tiny (it is GROUPed
output), so the ontology join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def table_inventory(out_spans: DataFrame) -> DataFrame:
    """(doc_id, table_idx, section, header) — one row per header occurrence.

    Reconstructs table membership from the ordered span sequence: a table's
    spans start at its 'section' span (running count = W2-style latch)."""
    w_doc = Window.partitionBy("doc_id").orderBy("order")
    seg = out_spans.filter(F.col("kind").isin("section", "header")).withColumn(
        "table_idx",
        F.sum(F.when(F.col("kind") == "section", 1).otherwise(0)).over(w_doc),
    )
    sections = seg.filter(F.col("kind") == "section").select(
        "doc_id", "table_idx", F.col("text").alias("section")
    )
    headers = seg.filter(F.col("kind") == "header").select(
        "doc_id", "table_idx", F.col("text").alias("header")
    )
    return sections.join(headers, ["doc_id", "table_idx"])


def settings_inventory(
    out_spans: DataFrame, ontology: DataFrame, max_examples: int = 3
) -> DataFrame:
    """A5/A6/O4/J4: the domain_settings content as a DataFrame:

    (section, header, n_tables, examples<=3, property) — property pre-filled
    from the ontology label table when a case-insensitive match exists, else
    '' (the blank the user fills in, WriteSettingsFile.py:60-104)."""
    inv = table_inventory(out_spans)
    grouped = inv.groupBy("section", "header").agg(
        F.count("*").alias("n_tables"),
        F.slice(F.sort_array(F.collect_set("doc_id")), 1, max_examples).alias(
            "examples"
        ),
    )
    onto = ontology.select(
        F.lower(F.col("label")).alias("__label"), F.col("property").alias("__prop")
    )
    return (
        grouped.join(
            F.broadcast(onto), F.lower("header") == F.col("__label"), "left"
        )
        .withColumn("property", F.coalesce("__prop", F.lit("")))
        .drop("__label", "__prop")
    )


def settings_lines(inventory: DataFrame) -> DataFrame:
    """S6: the settings-FILE sink — 'SECTION_<s>' group headers followed by
    '<header> = <property>' lines, ordered like WriteSettingsFile.py:27
    (sections sorted).  Write with df.select("line").write.text."""
    section_lines = inventory.select(
        F.col("section"),
        F.lit(0).alias("pos"),
        F.lit("").alias("hdr"),
        F.concat(F.lit("SECTION_"), F.regexp_replace("section", " ", "_")).alias(
            "line"
        ),
    ).distinct()
    header_lines = inventory.select(
        "section",
        F.lit(1).alias("pos"),
        F.col("header").alias("hdr"),
        F.concat_ws(" = ", "header", "property").alias("line"),
    )
    return (
        section_lines.unionByName(header_lines)
        .orderBy("section", "pos", "hdr")
        .select("section", "line")
    )
