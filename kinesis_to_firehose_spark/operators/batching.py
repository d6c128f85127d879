"""Placeholder — ops land per SURVEY.md §7 build plan."""
