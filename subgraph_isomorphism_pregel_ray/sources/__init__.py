"""Sources: deterministic synthetic pages + parquet table readers."""
