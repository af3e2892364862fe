"""Iceberg gating: unavailable runtime must fail loudly with guidance."""

from __future__ import annotations

import pytest

from table_extractor_spark.sources import iceberg as I


def test_gating_in_this_sandbox(spark):
    # no iceberg runtime jar in this container
    assert I.iceberg_available(spark) is False
    with pytest.raises(I.IcebergUnavailable, match="parquet"):
        I.read_table(spark, "lake.db.documents")
    with pytest.raises(I.IcebergUnavailable):
        I.read_incremental(spark, "lake.db.documents", 1)
    with pytest.raises(I.IcebergUnavailable):
        I.append(spark.range(1), "lake.db.out")
