"""Shared Spark fixtures for the test suite."""

from __future__ import annotations

import pytest


def make_spark(master: str = "local[4]", shuffle_partitions: int = 8):
    from table_extractor_spark.session import build_session

    return build_session(
        master=master,
        app_name="table-extractor-spark-tests",
        shuffle_partitions=shuffle_partitions,
        driver_memory="4g",
        # small Arrow batches in tests so multi-batch paths are exercised
        extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    yield s
    s.stop()
