#!/usr/bin/env python
"""Pure-Python kernel profiler (guide §1: measure first, §4.2: per-task work).

Synthesizes the same document shape ``sources.tables.synthesize_docs_from_testdata``
builds (heading span + wikitable text span + media span) WITHOUT Spark, then
times / cProfiles ``kernel.document.extract_document_cols`` over it.  This
isolates the Python-side cost of the one Arrow stage from scan/shuffle/Arrow
overhead so kernel optimizations can be measured in microseconds per doc.

Usage:
    python scripts/profile_kernel.py [n_docs] [table_rows] [--profile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_extractor_spark.kernel.document import extract_document_cols

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango"
).split()


def make_doc(i: int, table_rows: int):
    words = [WORDS[(i + j) % len(WORDS)] for j in range(table_rows)]
    rows = "".join(
        f"<tr><td>w{j}</td><td>{w}</td></tr>" for j, w in enumerate(words)
    )
    markup = (
        "About this page. "
        '<table class="wikitable"><tr><th>Idx</th><th>Word</th></tr>'
        + rows
        + "</table>"
    )
    doc_id = f"doc_{i}"
    kinds = ["heading", "text", "media"]
    texts = [f"Profile lang{i % 5}", markup, "src"]
    refs = ["", "", f"img://{doc_id}/0.jpg"]
    offsets = [0, 1, 2]
    return doc_id, kinds, texts, refs, offsets


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    table_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    docs = [make_doc(i, table_rows) for i in range(n_docs)]

    # warm
    for d in docs[:50]:
        extract_document_cols(*d)

    if "--profile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for d in docs:
            extract_document_cols(*d)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(35)
    else:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for d in docs:
                extract_document_cols(*d)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(
            f"docs={n_docs} rows={table_rows}: best {best:.3f}s "
            f"({n_docs / best:.0f} docs/s, {1e6 * best / n_docs:.1f} us/doc)"
        )


if __name__ == "__main__":
    main()
