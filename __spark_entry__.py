"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on a corpus synthesized
deterministically from /root/testdata/sf0.001 (BASELINE.json input_hint shape)
and returns the normalized output-span DataFrame.

``queries()``/``oracle_sql()`` expose the full operator battery from
``table_extractor_spark.plans.queries`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data operators (dedup, similarity, text
analysis, tokenizer induction, packing/mixing).  Since round 4 EVERY
registered query carries a DuckDB-runnable ANSI oracle: the approximate
(ANN) and iterative (k-means, PQ, BPE) families run integer-exact and
their oracles REPLAY the full deterministic training, so no rows-only
checks remain.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from table_extractor_spark.plans import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.extract_synthetic(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every registered query."""
    return _q.oracle_sql()
