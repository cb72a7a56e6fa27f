"""Utilities: timing, visualization, torch-weight conversion (SURVEY.md §2.6)."""
