#!/usr/bin/env python
"""Package table_extractor_spark for spark-submit --py-files.

Writes dist/table_extractor_spark.zip containing the package at zip root so
executors can ``import table_extractor_spark`` directly.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "table_extractor_spark")
DIST = os.path.join(REPO, "dist")
OUT = os.path.join(DIST, "table_extractor_spark.zip")


def main() -> str:
    os.makedirs(DIST, exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
