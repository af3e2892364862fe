"""Typed JSON extraction: hostile payloads must degrade to NULL, not fail."""

from __future__ import annotations

from pyspark.sql import functions as F


HOSTILE = [
    (1, '{"k": 42}'),          # clean
    (2, '{"k": 42, "x": 1}'),  # extra keys ignored
    (3, '{"x": 1}'),           # key missing -> null
    (4, "not json at all"),    # malformed -> null (PERMISSIVE)
    (5, ""),                   # empty string -> null
    (6, None),                 # null payload -> null
    (7, '{"k": "notanint"}'),  # wrong type -> null
    (8, '{"k": null}'),        # explicit null
    (9, '[1,2,3]'),            # non-object -> null
    (10, '{"k": 9223372036854775807}'),  # int64 max survives exactly
]


def _extract(spark):
    df = spark.createDataFrame(HOSTILE, "id long, props string")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return {r["id"]: r["k"] for r in df.select("id", k.alias("k")).collect()}


def test_hostile_json_degrades_to_null_never_raises(spark):
    got = _extract(spark)
    assert got[1] == 42
    assert got[2] == 42
    for i in (3, 4, 5, 6, 7, 8, 9):
        assert got[i] is None, (i, got[i])
    assert got[10] == 9223372036854775807


def test_typed_parse_agrees_with_string_path_on_clean_rows(spark):
    """get_json_object (string path) and from_json (typed) must agree
    wherever both produce a value — the engine standardizes on the typed
    path for the plan, the string path is the ad-hoc escape hatch."""
    df = spark.createDataFrame(HOSTILE, "id long, props string")
    typed = F.from_json(F.col("props"), "k BIGINT").getField("k")
    # plain .cast raises under ANSI for '{"k": "notanint"}' — the string
    # path needs try_cast, one more reason the typed parse is the default
    stringy = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    rows = df.select("id", typed.alias("t"), stringy.alias("s")).collect()
    for r in rows:
        if r["t"] is not None and r["s"] is not None:
            assert r["t"] == r["s"], r
    # and the clean row agrees through both
    byid = {r["id"]: (r["t"], r["s"]) for r in rows}
    assert byid[1] == (42, 42)
