"""Structured Streaming queries (SURVEY.md §2.9)."""
