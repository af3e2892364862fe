"""End-to-end curation pipeline: every stage observable on a constructed
corpus — gates drop chrome, PII twins collapse in exact dedup, near-dups
collapse in LSH dedup, split assignments are stable across re-runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from table_extractor_spark.plans.curation import curate, write_curated

GOOD = ("the quick brown fox jumps over a lazy dog and runs off to the "
        "river in the morning light with a happy ")


def _corpus(spark):
    def good_doc(i):
        # genuinely distinct docs (every content word carries the index) so
        # the near-dup stage must NOT collapse them
        body = " ".join(f"w{i}x{j}" for j in range(12))
        return f"the {body} of a doc{i} and some {i} to go in the end"

    rows = [
        *[(f"good_{i}", good_doc(i)) for i in range(8)],
        ("short", "too short"),
        ("linky", "x! y? z. !!! ??? ..."),  # no stopwords
        ("spammy", "buy " * 40),  # dup_word_ratio ~ 1
        # PII twins: identical after redaction
        ("pii_a", GOOD + "contact alice@example.com now for the offer"),
        ("pii_b", GOOD + "contact bob@other.org now for the offer"),
        # near-dup of good_0 (last word changed)
        ("near_0", good_doc(0)[:-3] + "new"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_stages_all_fire(spark):
    out = curate(_corpus(spark), near_dup_jaccard=0.7)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # gates dropped the chrome
    assert {"short", "linky", "spammy"} & kept == set()
    # PII twins collapsed to the smaller id
    assert "pii_a" in kept and "pii_b" not in kept
    # near-dup collapsed to the smaller id
    assert "good_0" in kept and "near_0" not in kept
    # the other good docs survived
    assert {f"good_{i}" for i in range(8)} <= kept
    # redaction applied to the surviving text
    pii_text = out.filter(F.col("doc_id") == "pii_a").collect()[0].text
    assert "<EMAIL>" in pii_text and "alice" not in pii_text


def test_curate_split_stable_across_runs(spark):
    a = {(r.doc_id, r.split) for r in curate(_corpus(spark)).collect()}
    b = {(r.doc_id, r.split) for r in
         curate(_corpus(spark).repartition(7)).collect()}
    assert a == b  # content- and partitioning-independent


def test_write_curated_partitions_by_split(spark, tmp_path):
    out_dir = str(tmp_path / "curated")
    write_curated(curate(_corpus(spark)), out_dir)
    parts = {d for d in os.listdir(out_dir) if d.startswith("split=")}
    assert parts  # at least one split dir materialized
    back = spark.read.parquet(out_dir)
    assert back.count() == curate(_corpus(spark)).count()


def test_connected_components_chain(spark):
    """A~B~C with A~/~C: exactly one component rooted at the min id."""
    from table_extractor_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([("A", "B"), ("B", "C")], ["a", "b"])
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {("A", "A"), ("B", "A"), ("C", "A")}


def test_connected_components_multi(spark):
    """Two components + a straggler pair ordered large-id-first."""
    from table_extractor_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 8), (10, 9), (7, 9)], ["a", "b"]
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 7, 10: 7}


def test_curate_collapses_duplicate_chain(spark):
    """Transitive near-dup chain collapses to ONE survivor even when the
    middle doc never appears as a pair's larger element vs the root."""

    base = [f"w{j}" for j in range(40)]

    def doc(extra):
        return " ".join(["the"] + base + ["of", "and", extra])

    rows = [
        ("chain_a", doc("aaa")),
        ("chain_b", doc("bbb")),
        ("chain_c", doc("ccc")),
        *[(f"good_{i}", " ".join(
            ["the"] + [f"g{i}x{j}" for j in range(30)] + ["of", "and"]))
          for i in range(4)],
    ]
    out = curate(spark.createDataFrame(rows, ["doc_id", "text"]),
                 near_dup_jaccard=0.5)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert "chain_a" in kept
    assert kept & {"chain_b", "chain_c"} == set()
    assert {f"good_{i}" for i in range(4)} <= kept


def test_connected_components_random_vs_union_find(spark):
    """Three seeded random graphs (including isolated pairs, chains, and a
    high-degree hub) vs a plain union-find computed in the test."""
    import random

    from table_extractor_spark.operators.dedup import connected_components

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # min-id per component
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        return {
            n: min(members)
            for members in comp.values()
            for n in members
        }

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n_nodes = 60
        edges = {(rng.randint(0, n_nodes), rng.randint(0, n_nodes))
                 for _ in range(45)}
        # high-degree hub: node 0 connected to a dozen others
        edges |= {(0, rng.randint(1, n_nodes)) for _ in range(12)}
        edges = [(u, v) for u, v in edges if u != v]
        nodes = {x for e in edges for x in e}

        pairs = spark.createDataFrame(edges, ["a", "b"])
        got = {
            r.node: r.component
            for r in connected_components(pairs).collect()
        }
        assert got == union_find_components(edges, nodes), f"seed={seed}"


def test_connected_components_long_chain_converges(spark):
    """A 64-node path graph (worst case for naive propagation) collapses to
    one component within the bounded iteration budget — the O(log n)
    large-star/small-star contraction claim, pinned."""
    from table_extractor_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["a", "b"]
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert set(got) == set(range(65))
    assert set(got.values()) == {0}
