"""Shared Spark fixtures for the test suite."""

from __future__ import annotations

import pytest


def make_spark(master: str = "local[4]", shuffle_partitions: int = 8):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName("table-extractor-spark-tests")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    yield s
    s.stop()
