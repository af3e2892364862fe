"""RDF triple emission: the reference Mapper's output path as DataFrame ops.

The reference maps each refined table row to triples (Mapper.py:83-113):

* a ROW triple  (resource, sectionProperty, resource__<k>)  where <k> is the
  per-document reification counter (A9, Mapper.py:97-98);
* per cell a CELL triple  (resource__<k>, headerProperty, typedValue)
  with the strict-then-loose rule cascade (J1, Mapper.py:134-191), the
  SECTION_ gate dropping whole unmapped tables (J2, :147-155), floats typed
  xsd:float via the py2 float test (F10, :193-214), and '-' cells skipped
  (P6, :104-106).

Here the same semantics run over the extraction output (out_spans) as pure
DataFrame transforms — window functions to reconstruct table/row/column
structure from the ordered span sequence, broadcast joins for the rules:

* table segmentation: running count of 'section' spans (W2-style latch);
* column index: position within the table's cell sequence modulo the
  table's header count (J5 positional zip, HtmlTableParser.py:944-951);
* reification index: row_number over (doc, table, row) (A9);
* rules: two broadcast LEFT joins + coalesce (strict `<section>_<header>`
  first, bare `<header>` second), inner broadcast join for the section gate.

Assumes tables whose data cells are plain text spans (kind='cell'); link
and media spans ride through as URI objects (media linkage per the north
rule).  At 10^12 docs every join here is a broadcast — the only shuffles
are the window partitions on doc_id, which reuse the pipeline's salted
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.typing import py2_float_matches

SECTION_PREFIX = "SECTION_"


def adjust_resource(c: Column) -> Column:
    """``MapperTools.adjust_resource`` (:298-311): strip ONE leading and ONE
    trailing space, then every remaining space becomes '_' — the cell-value
    -> URI-tail normalization the reference applies before probing."""
    out = F.regexp_replace(c, r"^ ", "")
    out = F.regexp_replace(out, r" $", "")
    return F.replace(out, F.lit(" "), F.lit("_"))


def emit_triples(
    out_spans: DataFrame, rules: DataFrame, entities: DataFrame = None
) -> DataFrame:
    """out_spans(doc_id, kind, text, media_ref, order) + rules(key, property)
    -> triples(doc_id, subject, predicate, object, object_kind, t_order).

    object_kind: 'resource' (row triples), 'uri' (cells with a media_ref),
    'float' (py-float-castable text, F10), else 'string'.

    ``entities`` (optional, column ``entity``) enables the reference's
    entity-existence probe (Mapper.check_value_type -> check_if_is_resource,
    Mapper.py:193-259): a non-float cell whose ``adjust_resource``-normalized
    value matches an existing entity becomes a 'resource' object carrying
    the ADJUSTED name (the reference emits ``dbr + resource_to_search``).
    The entity table is the dimension side — broadcast, J3's probe shape —
    and is expected to carry PRE-FOLDED probe keys (the reference folds
    accents at probe time, Utilities.py:451-464; at engine scale that fold
    belongs in the entity-table build, and the reference's substring-cache
    shortcut (Mapper.py:228-238) is a documented non-reproduced mechanic —
    the probe here is exact-match).  Typing precedence matches the
    reference: media-uri, then float, then resource probe, then string.
    """
    w_doc = Window.partitionBy("doc_id").orderBy("order")

    # table segmentation: which section-table does each span belong to
    seg = out_spans.withColumn(
        "table_idx",
        F.sum(F.when(F.col("kind") == "section", 1).otherwise(0)).over(w_doc),
    )

    # per-table header list (ordered) and section text
    w_tbl = Window.partitionBy("doc_id", "table_idx").orderBy("order")
    tables = (
        seg.filter(F.col("kind").isin("section", "header"))
        .groupBy("doc_id", "table_idx")
        .agg(
            F.max(F.when(F.col("kind") == "section", F.col("text"))).alias(
                "section"
            ),
            F.expr(
                "sort_array(collect_list(CASE WHEN kind = 'header' "
                "THEN struct(order, text) END))"
            ).alias("hdrs"),
        )
        .select(
            "doc_id",
            "table_idx",
            "section",
            F.expr("transform(hdrs, h -> h.text)").alias("headers"),
        )
    )

    # cells with column index = position mod header count (J5)
    cells = (
        seg.filter(F.col("kind") == "cell")
        .withColumn("cell_seq", F.row_number().over(w_tbl) - 1)
        .join(tables, ["doc_id", "table_idx"])
        .withColumn("n_headers", F.greatest(F.size("headers"), F.lit(1)))
        .withColumn("row_idx", (F.col("cell_seq") / F.col("n_headers")).cast("int"))
        .withColumn("col_idx", F.col("cell_seq") % F.col("n_headers"))
        .withColumn(
            "header", F.element_at("headers", F.col("col_idx").cast("int") + 1)
        )
    )

    # J2: section gate — inner broadcast join drops unmapped tables
    sect_rules = rules.select(
        F.col("key").alias("__skey"), F.col("property").alias("section_prop")
    )
    cells = cells.join(
        F.broadcast(sect_rules),
        F.concat(F.lit(SECTION_PREFIX), F.col("section")) == F.col("__skey"),
    )

    # reification index: monotone row counter across a doc's MAPPED tables
    # (A9) — dense_rank directly on the gated cells (each distinct (table,
    # row) gets the next counter value), riding the doc_id window partition
    # already paid for.  Computed AFTER the J2 gate because the reference's
    # map() never runs for an unmapped section, so gated tables consume no
    # reification indices (Mapper.py:92-98; pinned by the randomized batch
    # differential).  The r01 distinct+row_number+re-join did the same
    # numbering with an avoidable extra shuffle and join.
    w_rows = Window.partitionBy("doc_id").orderBy("table_idx", "row_idx")
    cells = cells.withColumn("reif", F.dense_rank().over(w_rows))

    # J1: strict `<section>_<header>` then loose `<header>` cascade
    strict = rules.select(
        F.col("key").alias("__stkey"), F.col("property").alias("strict_prop")
    )
    loose = rules.select(
        F.col("key").alias("__lokey"), F.col("property").alias("loose_prop")
    )
    cells = (
        cells.join(
            F.broadcast(strict),
            F.concat_ws("_", "section", "header") == F.col("__stkey"),
            "left",
        )
        .join(F.broadcast(loose), F.col("header") == F.col("__lokey"), "left")
        .withColumn("prop", F.coalesce("strict_prop", "loose_prop"))
    )

    subject_row = F.concat_ws("__", "doc_id", F.col("reif").cast("string"))

    # row triples: one per (doc, reified row) (Mapper.py:97-101)
    row_triples = (
        cells.select("doc_id", "section_prop", F.col("reif"), subject_row.alias("obj"))
        .distinct()
        .select(
            "doc_id",
            F.col("doc_id").alias("subject"),
            F.col("section_prop").alias("predicate"),
            F.col("obj").alias("object"),
            F.lit("resource").alias("object_kind"),
            (F.col("reif") * 1000).alias("t_order"),
        )
    )

    # cell triples: mapped, non-empty cells; typed via the py2 float()
    # grammar (F10, MapperTools.py:183-195) — NOT try_cast, whose grammar
    # differs (e.g. '1.5D' casts in Spark, raises in py2).  The reference's
    # xsd:int branch (Mapper.py:204-205) is unreachable for string cells —
    # every string py2 int() accepts, py2 float() accepts first — so no
    # 'int' kind exists here (documented rather than ported as dead code).
    mapped = cells.filter(F.col("prop").isNotNull() & (F.col("text") != "-"))
    if entities is not None:
        ent = entities.select(F.col("entity").alias("__ent")).distinct()
        mapped = mapped.withColumn("__adj", adjust_resource(F.col("text"))).join(
            F.broadcast(ent), F.col("__adj") == F.col("__ent"), "left"
        )
        probe_hit = F.col("__ent").isNotNull()
    else:
        probe_hit = F.lit(False)

    cell_triples = mapped.select(
        "doc_id",
        subject_row.alias("subject"),
        F.col("prop").alias("predicate"),
        F.when(F.col("media_ref") != "", F.col("media_ref"))
        .when(py2_float_matches(F.col("text")), F.col("text"))
        .when(probe_hit, F.col("__adj") if entities is not None else F.col("text"))
        .otherwise(F.col("text"))
        .alias("object"),
        F.when(F.col("media_ref") != "", F.lit("uri"))
        .when(py2_float_matches(F.col("text")), F.lit("float"))
        .when(probe_hit, F.lit("resource"))
        .otherwise(F.lit("string"))
        .alias("object_kind"),
        (F.col("reif") * 1000 + F.col("col_idx") + 1).alias("t_order"),
    )

    return row_triples.unionByName(cell_triples)


def _ttl_escape_literal(c: Column) -> Column:
    """Turtle string-literal escaping (grammar ECHAR): backslash first, then
    double quote, newline, carriage return, tab.  The reference serializes
    via rdflib (which escapes); emitting raw cell text would produce
    malformed Turtle for real wiki content."""
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


# characters the IRIREF production forbids inside <...>, percent-encoded;
# '%' first so already-encoded input stays decodable
_IRI_ESCAPES = (
    ("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22"),
    ("{", "%7B"), ("}", "%7D"), ("|", "%7C"), ("^", "%5E"), ("`", "%60"),
    ("\\", "%5C"), ("\n", "%0A"), ("\r", "%0D"), ("\t", "%09"),
)


def _ttl_escape_iri(c: Column) -> Column:
    """Percent-encode the IRIREF-forbidden characters in a URI tail built
    from data (doc_id / media_ref) so every <...> term is valid Turtle."""
    out = c
    for raw, enc in _IRI_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(enc))
    return out


def ttl_lines(
    triples: DataFrame,
    base_uri: str = "http://dbpedia.org/resource/",
    ontology_uri: str = "http://dbpedia.org/ontology/",
) -> DataFrame:
    """S5: serialize triples to Turtle text lines (one string column), the
    DataFrame equivalent of graph.serialize(dest, 'turtle')
    (Analyzer.py:198-245).  Write with ``df.write.text``.  Literals are
    ECHAR-escaped and data-derived URI terms percent-encoded, so the output
    parses as Turtle whatever the cell text contains.

    Namespaces follow the reference's Mapper exactly (Mapper.py:76-81,
    100-113, confirmed against its PUBLISHED extraction outputs under
    Extractions/): subjects and resource-valued objects live under dbr
    (``base_uri``), mapped PROPERTIES under dbo (``ontology_uri``) — the
    r3-and-earlier serializer put predicates under dbr, which no reference
    .ttl ever does."""
    uri = lambda c: F.concat(  # noqa: E731
        F.lit("<"), F.lit(base_uri), _ttl_escape_iri(c), F.lit(">")
    )
    pred = F.concat(
        F.lit("<"), F.lit(ontology_uri), _ttl_escape_iri(F.col("predicate")),
        F.lit(">"),
    )
    lit = lambda c: F.concat(F.lit('"'), _ttl_escape_literal(c), F.lit('"'))  # noqa: E731
    obj = (
        F.when(F.col("object_kind") == "resource", uri(F.col("object")))
        .when(
            F.col("object_kind") == "uri",
            F.concat(F.lit("<"), _ttl_escape_iri(F.col("object")), F.lit(">")),
        )
        .when(
            F.col("object_kind") == "float",
            F.concat(
                lit(F.col("object")),
                F.lit("^^<http://www.w3.org/2001/XMLSchema#float>"),
            ),
        )
        # the reference types plain strings EXPLICITLY
        # (Mapper.check_value_type: Literal(..., datatype=XSD.string);
        # published .ttl shows "..."^^xsd:string) — term-identical to a
        # plain literal under RDF 1.1, serialized the reference's way
        .otherwise(
            F.concat(
                lit(F.col("object")),
                F.lit("^^<http://www.w3.org/2001/XMLSchema#string>"),
            )
        )
    )
    return triples.select(
        "doc_id",
        "t_order",
        F.concat_ws(
            " ", uri(F.col("subject")), pred, obj, F.lit(".")
        ).alias("line"),
    )


def write_ttl(
    triples: DataFrame,
    path: str,
    base_uri: str = "http://dbpedia.org/resource/",
    partitions: int | None = None,
) -> None:
    """S5 sink with GLOBAL (doc_id, t_order) order across the output files.

    ``repartitionByRange`` + ``sortWithinPartitions``: file i's lines all
    precede file i+1's, and lines are sorted inside each file — the
    distributed equivalent of the reference's single ordered .ttl
    (Analyzer.py:198-245) without the single-partition ``orderBy`` sink
    that would funnel 10^12 rows through one task.  Range boundaries come
    from Spark's reservoir sample of the sort keys, so skew in doc sizes
    balances across files."""
    lines = ttl_lines(triples, base_uri)
    if partitions is not None:
        ranged = lines.repartitionByRange(partitions, "doc_id", "t_order")
    else:
        ranged = lines.repartitionByRange("doc_id", "t_order")
    (
        ranged.sortWithinPartitions("doc_id", "t_order")
        .select("line")
        .write.mode("overwrite")
        .text(path)
    )


def linearize_tables(
    spans: DataFrame,
    kv_sep: str = ": ",
    col_sep: str = " | ",
    row_sep: str = "\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document TRAINING TEXT from extracted table spans — the
    "table-to-text" serialization an LLM-pretraining pipeline applies to
    mined tables (each data row becomes "Header1: v1 | Header2: v2", rows
    joined in table order): the step that turns this engine's extraction
    output into corpus documents.

    The header↔cell pairing is the positional zip of the reference's
    Mapper (J5 — cell k of a row pairs with header k; reference
    Mapper.py row/cell iteration), done at the DataFrame layer: headers
    collect per doc into one broadcast-sized array column, cells index
    themselves with a per-doc ROW_NUMBER, and (row, col) = divmod(idx,
    n_headers).  Spans must be ONE table per document (the synthetic
    corpus's shape; multi-table docs need a table-id column to segment
    on — the kernel keeps tables contiguous in ``order`` but the flat
    span schema carries no table boundary).

    Returns (doc_id, n_rows, linearized) with the full text — md5-compact
    it at the query surface if the consumer only needs an identity.

    Shape: one per-doc window over cells + two co-partitioned groupBys on
    the doc id (Catalyst reuses the hash partitioning), headers joined
    broadcast-style per doc; no Python, no global sort.
    """
    hdrs = (
        spans.filter(F.col("kind") == "header")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("order", "text"))),
                lambda s: s.getField("text"),
            ).alias("__headers")
        )
    )
    w = Window.partitionBy(id_col).orderBy("order")
    cells = (
        spans.filter(F.col("kind") == "cell")
        .withColumn("__idx", F.row_number().over(w) - 1)
        .join(hdrs, id_col)
        .withColumn("__n_h", F.size("__headers"))
        .withColumn("__row", F.expr("__idx div __n_h"))
        .withColumn("__col", F.expr("__idx % __n_h"))
        .withColumn(
            "__pair",
            F.concat(
                F.element_at("__headers", F.col("__col").cast("int") + 1),
                F.lit(kv_sep),
                F.col("text"),
            ),
        )
    )
    rows = cells.groupBy(id_col, "__row").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__col", "__pair"))),
                lambda s: s.getField("__pair"),
            ),
            col_sep,
        ).alias("__row_text")
    )
    return rows.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__row", "__row_text"))),
                lambda s: s.getField("__row_text"),
            ),
            row_sep,
        ).alias("linearized"),
    )
