"""Table format shim: parquet + snapshot manifest (Iceberg-style)."""
