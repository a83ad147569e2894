"""Relational operator library (batch forms of SURVEY.md §2 operators)."""
