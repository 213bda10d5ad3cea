"""Distributed operators (SURVEY.md §2.2-§2.6, §2.10 + north-rule surface)."""
