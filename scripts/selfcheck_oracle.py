"""Self-check harness mimicking the driver's Spark-vs-DuckDB comparison.

For each ``queries()[name]``:
  * run the Spark DataFrame at sf0.01,
  * run ``oracle_sql()[name]`` in DuckDB over the same parquet views,
  * compare row count, column-name set, and an order-insensitive value hash
    (columns sorted by name, every value normalized to a string, rows sorted).

Usage: python3 scripts/selfcheck_oracle.py [--pandas] [--sf DIR] [name ...]

``--sf DIR`` points both engines at another scale factor's parquet
directory (equivalent to SPARK_GRAFT_SF_DIR=DIR).  Positional names
restrict the run; a name matching NO registered query aborts loudly —
a silent zero-query run once reported "all queries match" for a typo'd
flag value, which is exactly the false green this guard exists to kill.

``--pandas`` switches to the fetch path a typical driver harness uses —
DuckDB ``rel.df()`` (pandas) instead of ``fetchall()``, and a NAIVE
``str(value)`` normalization instead of the int-collapsing one.  This is
the mode that catches the r4 driver-red class: DuckDB promotes integer SUM
to HUGEINT, ``.df()`` renders that float64 ('3' -> '3.0'), and only a
naive normalization surfaces the mismatch.  Run both modes before
registering a new query.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def naive_norm(v):
    """Driver-harness-shaped normalization: plain str(), no float/Decimal
    canonicalization — so type drift between engines (e.g. HUGEINT ->
    float64 under a pandas fetch) is VISIBLE instead of papered over."""
    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(naive_norm(x) for x in v) + "]"
    try:  # numpy arrays from a pandas fetch
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(naive_norm(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            return str(v.item())
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, float) and v != v:
        return "NaN"
    return str(v)


def frame_fingerprint(cols, rows, norm=norm_value):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "surrogateescape"))
        h.update(b"\x00")
    return h.hexdigest()


def main():
    global SF_DIR
    args = sys.argv[1:]
    pandas_mode = "--pandas" in args
    if "--sf" in args:
        i = args.index("--sf")
        try:
            SF_DIR = args[i + 1]
        except IndexError:
            sys.exit("--sf needs a directory argument")
        if not os.path.isdir(SF_DIR):
            sys.exit(f"--sf: no such directory {SF_DIR!r}")
        del args[i:i + 2]
    only = set(a for a in args if not a.startswith("--"))
    norm = naive_norm if pandas_mode else norm_value
    import __spark_entry__ as entry
    from tests.conftest import make_spark

    spark = make_spark("local[8]", 16)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        sys.exit(
            f"unknown query name(s): {sorted(unknown)} — refusing to run "
            "a silently-empty check"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            if pandas_mode:
                # fetch Spark via pandas too — the faithful driver shape.
                # Both engines then promote NULL-bearing int columns to
                # float64/NaN identically, so the only mismatches left are
                # REAL cross-engine type drift (e.g. DuckDB's HUGEINT SUM
                # promotion, which Spark's non-null bigint never mirrors).
                rows = [
                    tuple(r)
                    for r in df.toPandas().itertuples(index=False, name=None)
                ]
            else:
                rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(rows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            if pandas_mode:
                pdf = rel.df()
                orows = [
                    tuple(r) for r in pdf.itertuples(index=False, name=None)
                ]
            else:
                orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns {sorted(cols)} != {sorted(ocols)}")
        if not problems:
            fp_s = frame_fingerprint(cols, rows, norm)
            fp_o = frame_fingerprint(ocols, orows, norm)
            if fp_s != fp_o:
                problems.append("value-hash mismatch")
                # show a differing sample
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(norm(r[i]) for i in order_s) for r in rows)
                lo = sorted("|".join(norm(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark: {a[:300]}")
                        problems.append(f"  duck : {b[:300]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"OK   {name}: {len(rows)} rows match ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
