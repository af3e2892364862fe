"""table_extractor_spark."""
