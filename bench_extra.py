#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1: measure first).

Complements the FROZEN ``bench.py`` (driver contract) with:

* per-query timing through the **noop sink** (guide §1.4) so every column is
  computed and the timing measures the plan, not ``count()`` pruning;
* ``count()`` timing as well (the driver's methodology) for comparability;
* ``.explain("formatted")`` capture into ``plans/r07/<query>_<tag>.txt``;
* job descriptions per query so the UI (when enabled) is readable.

Usage:
    python bench_extra.py [--queries q1,q2,...] [--plans-tag before|after]
                          [--reps N] [--no-noop] [--extract-breakdown]

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), core count
from $SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = (
    "extract_synthetic",
    "extract_metrics_report",
    "q1_pricing_summary",
    "rule_lookup_cascade",
    "section_fill_down",
    "dedup_exact",
    "ngram_jaccard_dedup",
    "embedding_cosine_topk",
    "quality_score",
    "token_count",
)


def build_spark():
    from table_extractor_spark.session import build_session

    return build_session(
        master=f"local[{CPUS}]",
        app_name=f"bench-extra-{CPUS}",
        shuffle_partitions=CPUS,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--plans-tag", default=None,
                    help="write plans/r07/<q>_<tag>.txt explain dumps")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--extract-breakdown", action="store_true",
                    help="time synthesis vs full pipeline for extract_synthetic")
    args = ap.parse_args()

    from table_extractor_spark.plans import queries as Q

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    registry = Q.queries()

    # warm JVM + python worker pool like bench.py does
    spark.range(1000).selectExpr("sum(id)").collect()
    from table_extractor_spark.plans.extract import extract_pipeline
    from table_extractor_spark.sources.tables import fixture_corpus_df

    warm_out, _ = extract_pipeline(fixture_corpus_df(spark, copies=CPUS),
                                   num_partitions=CPUS)
    warm_out.count()

    names = [n for n in args.queries.split(",") if n]
    out = {}
    for name in names:
        fn = registry[name]
        if args.plans_tag:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r07/{name}_{args.plans_tag}.txt", "w") as f:
                f.write(txt)
        rec = {}
        for mode in (("count",) if args.no_noop else ("count", "noop")):
            runs = []
            for _ in range(args.reps):
                sc.setJobDescription(f"{name} [{mode}]")
                df = fn(spark, SF_DIR)
                t0 = time.monotonic()
                if mode == "count":
                    df.count()
                else:
                    noop(df)
                runs.append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(None)
            rec[mode] = runs
            rec[f"{mode}_min"] = min(runs)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    if args.extract_breakdown:
        from table_extractor_spark.sources.tables import (
            synthesize_docs_from_testdata,
        )

        br = {}
        for label, thunk in (
            ("synthesis_count", lambda: synthesize_docs_from_testdata(
                spark, SF_DIR).count()),
            ("synthesis_noop", lambda: noop(
                synthesize_docs_from_testdata(spark, SF_DIR))),
            ("pipeline_noop", lambda: noop(extract_pipeline(
                synthesize_docs_from_testdata(spark, SF_DIR),
                num_partitions=32, salt=1)[0])),
            ("pipeline_noprefilter_norepart", lambda: noop(extract_pipeline(
                synthesize_docs_from_testdata(spark, SF_DIR),
                num_partitions=32, salt=1, prefilter=False)[0])),
        ):
            runs = []
            for _ in range(args.reps):
                sc.setJobDescription(f"breakdown:{label}")
                t0 = time.monotonic()
                thunk()
                runs.append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(None)
            br[label] = runs
            print(json.dumps({label: runs}), flush=True)
        out["extract_breakdown"] = br

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
