"""Structured Streaming layer (SURVEY.md §2.9)."""
