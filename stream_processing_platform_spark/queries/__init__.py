"""Declared query inventory (SURVEY.md §2) — importing the submodules
registers every named query + duckdb oracle in the registry."""
