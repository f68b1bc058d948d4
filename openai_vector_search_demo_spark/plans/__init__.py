"""Composed end-to-end pipelines (SURVEY.md §3 entry points)."""
