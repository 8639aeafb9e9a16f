"""Source connectors beyond parquet/Iceberg (see pipeline.read_pages)."""
