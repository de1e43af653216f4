"""Sink connectors (SURVEY.md §2.6)."""
