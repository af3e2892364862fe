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
    # section key normalization per WriteSettingsFile.py:60-62:
    # ' ' and '-' -> '_'; replace_accents is a NO-OP for these keys in the
    # reference (unicode input hits the TypeError quirk of
    # delete_accented_characters, Utilities.py:451-464) so accents stay
    section_lines = inventory.select(
        F.col("section"),
        F.lit(0).alias("pos"),
        F.lit("").alias("hdr"),
        F.concat(
            F.lit("SECTION_"),
            F.translate("section", " -", "__"),
        ).alias("line"),
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


def resource_list_lines(uris: DataFrame, uri_col: str = "uri") -> DataFrame:
    """S7: the Selector's resource-list content (Selector.py:80-124): keep
    URIs containing 'resource', take the path segment AFTER the 'resource'
    segment, one name per line.  All JVM-side (split + array_position)."""
    parts = F.split(F.col(uri_col), "/")
    pos = F.array_position(parts, "resource")
    return (
        uris.filter(F.col(uri_col).contains("resource"))
        # a URI merely CONTAINING 'resource' without an exact segment hits
        # list.index's ValueError in the reference -> swallowed, row skipped
        .filter(pos > 0)
        .select(F.element_at(parts, (pos + 1).cast("int")).alias("line"))
        .filter(F.col("line").isNotNull())
    )


def write_resource_list(
    uris: DataFrame, path: str, uri_col: str = "uri"
) -> None:
    """S7 sink: ``Resource_lists/<date>_<topic>_<chapter>.txt`` equivalent —
    the caller picks the path; content is one resource name per line.  A
    plain distributed text write: at 10^9 resources this is many part files,
    exactly what a downstream Spark read wants (the reference's single
    file handle, Selector.py:106, is the single-node bottleneck replaced)."""
    resource_list_lines(uris, uri_col).write.mode("overwrite").text(path)
