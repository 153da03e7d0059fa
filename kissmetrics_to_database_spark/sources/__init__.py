"""Sources: NDJSON/CSV/parquet readers, malformed-JSON repair,
incremental file discovery + watermark state (SURVEY.md §2.1)."""
