"""Scalar-function layer (SURVEY.md §2.7) and row transforms (§2.2).

Everything here is built from ``pyspark.sql.functions`` so the
expressions stay inside whole-stage codegen — no Python in the hot
path.
"""
