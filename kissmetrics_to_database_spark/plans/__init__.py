"""Declared query catalog: every operator from SURVEY.md §2 exposed as
a (PySpark query, DuckDB oracle SQL) pair for the correctness gate."""
