#!/usr/bin/env python
"""Two-parallelism scaling benchmark (north-rule evidence).

The rule requires >=0.8 throughput scaling efficiency between clusters of N
and 4N executors.  This sandbox has one machine, so we evidence it the way
BASELINE.json prescribes: the SAME extraction job, the SAME input, run at
local[N] and local[4N]; efficiency = (thr_4N / thr_N) / 4.

Each parallelism level runs in its OWN subprocess/JVM (no cache sharing).
Within a JVM the job runs ``--reps`` times and the fastest run is kept —
we want the steady-state compute rate, not codegen/worker-spawn noise (a real
cluster amortizes those over hours).

Usage:  python scripts/bench_scaling.py [--n 8] [--mult 4] [--copies 8]
Prints one JSON line; paste/record results in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from table_extractor_spark.session import build_session

cpus, copies, sf_dir, reps, table_rows = {cpus}, {copies}, {sf_dir!r}, {reps}, {table_rows}
spark = build_session(
    master=f"local[{{cpus}}]",
    app_name=f"scaling-{{cpus}}",
    shuffle_partitions=2 * cpus,
)
spark.sparkContext.setLogLevel("ERROR")
from table_extractor_spark.plans.extract import extract_pipeline
from table_extractor_spark.sources.tables import synthesize_docs_from_testdata

# identical deterministic corpus at every parallelism level: the synthesized
# sf corpus at reference-scale document weight (table_rows rows per table —
# the sf default of 6 is oracle-sized, ~100x lighter than a real wiki page,
# and would measure fixed overhead instead of extraction scaling), replicated
# `copies` times with distinct doc_ids
base = synthesize_docs_from_testdata(spark, sf_dir, table_rows=table_rows)
docs = (
    base.select(
        F.explode(F.sequence(F.lit(1), F.lit(copies))).alias("copy"), "doc_id", "spans"
    )
    .select(
        F.concat_ws("_", "doc_id", F.col("copy").cast("string")).alias("doc_id"),
        "spans",
    )
)
# materialize the input once, PRE-SPREAD across plenty of partitions — the
# parquet source is one tiny file, and a 1-partition input would make every
# downstream shuffle's map side single-threaded (that's an artifact of the
# small-file sandbox, not of the plan; a 100 TB Iceberg scan arrives in
# thousands of splits).  Time ONLY the pipeline.
docs = docs.repartition(256).localCheckpoint()
n_docs = docs.count()

best = None
for rep in range(reps):
    t0 = time.monotonic()
    # 2 tasks/core: enough skew headroom, without paying the per-task
    # python-worker feed cost 4x (parts=4*cpus measured ~10% slower both legs)
    out, metrics = extract_pipeline(docs, num_partitions=2 * cpus, salt=rep)
    n_spans = out.count()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best

# order-independent content hash of the final output: MUST be identical
# across parallelism levels and salts (determinism evidence: same results
# on an N-core and a 4N-core "cluster")
out, _ = extract_pipeline(docs, num_partitions=2 * cpus, salt=0)
content_hash = out.select(
    F.bit_xor(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "doc_id", "kind", "text", "media_ref",
                                  F.col("order").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
    ).alias("h")
).collect()[0]["h"]
print(json.dumps({{"cpus": cpus, "docs": n_docs, "spans": n_spans,
                   "best_sec": round(best, 3),
                   "docs_per_sec": round(n_docs / best, 2),
                   "content_hash": content_hash}}))
spark.stop()
"""


def run_level(cpus: int, copies: int, sf_dir: str, reps: int, table_rows: int) -> dict:
    code = _WORKER.format(
        repo=REPO, cpus=cpus, copies=copies, sf_dir=sf_dir, reps=reps,
        table_rows=table_rows,
    )
    # PIN the whole process tree (JVM + Python UDF workers) to `cpus` cores:
    # pandas-UDF workers are separate processes OUTSIDE the executor thread
    # pool, so an unpinned local[8] silently borrows idle cores and the
    # measured "8-core" throughput is inflated (~2x observed).  taskset makes
    # local[N] an honest N-core cluster.
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset") or os.path.exists("/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _ceiling_worker(n: int) -> float:
    """Parse n synthetic docs in-process; returns docs/sec (no Spark).

    The docs are VARIED (distinct cell strings per document, cycled), not
    one document parsed n times: parsing the identical string repeatedly
    runs ~1.23x faster than real varied data (hot string caches/interning
    and branch predictors), which inflated the r2/r3 "hardware ceiling"
    and made the Spark legs look ~20% further from it than they were.
    The ceiling must model the corpus the pipeline actually parses."""
    import time as _time

    sys.path.insert(0, REPO)
    from table_extractor_spark.kernel.document import extract_document

    docs = []
    for j in range(200):
        rows = "".join(
            f"<tr><td>w{j}_{i}</td><td>word{j}_{i}</td></tr>" for i in range(48)
        )
        markup = (
            '<table class="wikitable"><tr><th>Idx</th><th>Word</th></tr>'
            + rows + "</table>"
        )
        docs.append([
            {"kind": "heading", "text": f"Profile en {j}", "media_ref": "",
             "offset": 0},
            {"kind": "text", "text": "About. " + markup, "media_ref": "",
             "offset": 1},
            {"kind": "media", "text": "src", "media_ref": f"img://x{j}/0.jpg",
             "offset": 2},
        ])
    t0 = _time.monotonic()
    for i in range(n):
        extract_document(f"doc_{i}", docs[i % 200])
    return n / (_time.monotonic() - t0)


_CEILING_CODE = r"""
import multiprocessing as mp, sys, time
sys.path.insert(0, {repo!r})
from scripts.bench_scaling import _ceiling_worker
procs, per_proc, reps = {procs}, {per_proc}, {reps}
best = None
if __name__ == "__main__":
    for _ in range(reps):
        with mp.Pool(procs) as pool:
            t0 = time.monotonic()
            pool.map(_ceiling_worker, [per_proc] * procs)
            wall = time.monotonic() - t0
        best = wall if best is None or wall < best else best
    print(procs * per_proc / best)
"""


def hardware_ceiling(
    n_small: int, n_big: int, per_proc: int = 3000, reps: int = 3
) -> dict:
    """Max achievable process-scaling on THIS machine, measured with the pure
    Python kernel under multiprocessing (no Spark, no shuffle, no Arrow).
    One box shares a memory bus and turbo budget across cores, so even
    perfectly parallel work scales sublinearly — this is the denominator any
    single-machine scaling number must be judged against.  Each level runs
    taskset-pinned in its own subprocess, best of ``reps``."""
    out = {}
    for procs in (n_small, n_big):
        code = _CEILING_CODE.format(
            repo=REPO, procs=procs, per_proc=per_proc, reps=reps
        )
        cmd = ["taskset", "-c", f"0-{procs - 1}", sys.executable, "-c", code]
        r = subprocess.run(cmd, capture_output=True, text=True, check=True)
        out[procs] = round(float(r.stdout.strip().splitlines()[-1]), 1)
    eff = (out[n_big] / out[n_small]) / (n_big / n_small)
    return {
        "docs_per_sec": out,
        "ceiling_efficiency": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N")
    ap.add_argument("--mult", type=int, default=4, help="big level = N * mult")
    ap.add_argument("--copies", type=int, default=8, help="corpus replication")
    ap.add_argument("--reps", type=int, default=3, help="runs per level (keep best)")
    ap.add_argument(
        "--table-rows", type=int, default=48,
        help="rows per synthesized wikitable (doc weight; 48 ~ a real page)",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    small = run_level(args.n, args.copies, args.sf_dir, args.reps, args.table_rows)
    big = run_level(
        args.n * args.mult, args.copies, args.sf_dir, args.reps, args.table_rows
    )
    assert small["content_hash"] == big["content_hash"], (
        "output differs between parallelism levels: "
        f"{small['content_hash']} != {big['content_hash']}"
    )
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / args.mult
    ceiling = hardware_ceiling(args.n, args.n * args.mult)
    rel = eff / ceiling["ceiling_efficiency"] if ceiling["ceiling_efficiency"] else None
    print(
        json.dumps(
            {
                "n": small,
                "4n": big,
                "mult": args.mult,
                "scaling_efficiency": round(eff, 3),
                "pass": eff >= 0.8,
                "deterministic_across_levels": True,
                "hw_ceiling": ceiling,
                "efficiency_vs_ceiling": round(rel, 3) if rel else None,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
