"""Structured Streaming slice (SURVEY.md §2.8 ST1-ST5)."""
