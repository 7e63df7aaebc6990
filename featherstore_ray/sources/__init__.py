"""Sources and sinks (Parquet-first, per SURVEY.md §2.1)."""
