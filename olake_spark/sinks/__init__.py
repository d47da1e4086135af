"""Sinks: transactional managed parquet table, partitioned parquet writer."""
