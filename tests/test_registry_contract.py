"""Driver-contract invariants on the query registry."""

from __future__ import annotations

import json
import os

from table_extractor_spark.plans import queries as Q


def test_queries_and_oracles_consistent():
    q = Q.queries()
    o = Q.oracle_sql()
    assert set(o) <= set(q)
    # only the by-design approximate ANN queries lack oracles
    assert set(q) - set(o) == {"ann_lsh_bucketed", "ann_ivf_probed", "ann_ivf_pq"}


def test_unledgered_queries_surface_first():
    """The driver checks at most the first 50 queries() entries; everything
    not in the r02 ledger must fit inside that window so it gets a
    CORRECTNESS row this round."""
    ledger_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_r02.json",
    )
    ledgered = set(json.load(open(ledger_path)))
    names = list(Q.queries())
    fresh = [n for n in names if n not in ledgered]
    assert names[: len(fresh)] == fresh, "fresh queries must come first"
    assert len(fresh) <= 50, (
        f"{len(fresh)} unledgered queries exceed the driver's 50-row cap; "
        "rotate _DRIVER_LEDGERED_R02 forward"
    )


def test_registry_names_unique():
    names = [n for n, _, _ in Q._REGISTRY]
    assert len(names) == len(set(names))
