"""Relational operators of the engine (SURVEY.md §2.3–§2.5 + M6 extensions)."""
