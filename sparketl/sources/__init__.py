"""Ingest sources: Excel (SRC-01), CSV/JSON/Parquet (native Spark)."""
