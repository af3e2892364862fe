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


def test_r4_window_covers_must_reverify_queries():
    """The driver checks at most the first 50 queries() entries; the r4
    window must lead with every query that needs a fresh row (the r3 red
    row, the newly-oracled ANN family, code-changed queries), then rotate
    the stalest (r2) ledger rows into the remaining slots."""
    names = list(Q.queries())
    window = names[:50]
    assert list(names[: len(Q._R4_FRONT)]) == list(Q._R4_FRONT)
    # every registered query is ledgered r2 or r3 or in the front
    r3 = set(json.load(open(_repo_file("CORRECTNESS_r03.json"))))
    known = set(Q._R4_FRONT) | set(Q._DRIVER_LEDGERED_R02) | r3
    missing = [n for n in names if n not in known]
    assert missing == [], f"queries with no driver row ever: {missing}"
    # remaining window slots re-sample the stalest rows (r2 ledger)
    for n in window[len(Q._R4_FRONT):]:
        assert n in Q._DRIVER_LEDGERED_R02, (
            f"{n} is r3-fresh but occupies a re-sample slot"
        )


def test_registry_names_unique():
    names = [n for n, _, _ in Q._REGISTRY]
    assert len(names) == len(set(names))
