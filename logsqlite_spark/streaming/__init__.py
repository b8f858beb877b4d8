"""Streaming: ingest pipeline + follow mode (SURVEY.md §2.1, §2.5)."""
