"""Driver-contract invariants on the query registry."""

from __future__ import annotations

import json
import os

from table_extractor_spark.plans import queries as Q


def test_queries_and_oracles_consistent():
    q = Q.queries()
    o = Q.oracle_sql()
    assert set(o) <= set(q)
    # since r4, EVERY registered query has a driver-checkable oracle (the
    # ANN family's deterministic training is replayed in SQL)
    assert set(q) - set(o) == set()


def _repo_file(name):
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), name
    )


def test_r5_window_covers_must_reverify_queries():
    """The driver checks at most the first 50 queries() entries; the r5
    window must lead with the four formerly-red queries (HUGEINT-cast
    oracle fix), the new bpe_encode row, the divergence probe battery,
    and the 13 rows whose latest green is still the r2 ledger — then the
    remaining slots re-sample the stalest (r3) rows, with r4-fresh rows
    last."""
    names = list(Q.queries())
    window = names[:50]
    assert list(names[: len(Q._R5_FRONT)]) == list(Q._R5_FRONT)
    # the four r4 reds lead, their probes are all inside the window
    for must in (
        "bpe_pair_counts", "bpe_merges", "shard_assembly",
        "paragraph_dedup", "bpe_encode", "bpe_roundtrip",
    ):
        assert must in window
    probes = [n for n in names if n.startswith("probe_")]
    assert set(probes) <= set(window), "every probe must get a driver row"
    # the 13 r2-stale rows are all re-sampled this round
    r2_stale_front = [
        n for n in Q._R5_FRONT if n in Q._DRIVER_LEDGERED_R02
    ]
    assert len(r2_stale_front) == 13
    # every registered query is ledgered somewhere or in the front
    r3 = set(json.load(open(_repo_file("CORRECTNESS_r03.json"))))
    r4 = set(json.load(open(_repo_file("CORRECTNESS_r04.json"))))
    known = (
        set(Q._R5_FRONT) | set(Q._DRIVER_LEDGERED_R02) | r3 | r4
        | set(probes)
    )
    missing = [n for n in names if n not in known]
    assert missing == [], f"queries with no driver row ever: {missing}"
    # remaining window slots re-sample the stalest rows first: nothing
    # r4-fresh may occupy a slot while an r3-stale query sits outside
    for n in window[len(Q._R5_FRONT):]:
        assert n not in Q._DRIVER_LEDGERED_R04, (
            f"{n} is r4-fresh but occupies a re-sample slot"
        )


def test_no_hugeint_oracle_outputs():
    """Root-cause regression net for the r3/r4 driver-reds: DuckDB
    promotes integer SUM to HUGEINT (int128), and a pandas/Arrow fetch
    renders that float64/decimal128 ('3' -> '3.0') — hash-red at any
    driver that doesn't fetch via fetchall().  Exactly the four r4-red
    queries (and no green one) had a HUGEINT output column.  Bind every
    registered oracle (planning only — nothing executes) and assert the
    class is extinct."""
    import duckdb

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    offenders = []
    for name, sql in Q.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip([d[0] for d in rel.description], rel.types):
            if str(typ).upper() in ("HUGEINT", "UHUGEINT"):
                offenders.append(f"{name}.{col}")
    assert offenders == [], (
        "uncast int128 oracle outputs (wrap in CAST(... AS BIGINT)): "
        f"{offenders}"
    )


def test_registry_names_unique():
    names = [n for n, _, _ in Q._REGISTRY]
    assert len(names) == len(set(names))
