"""Structured Streaming layer: watermarks, windows, dedup, joins, and the
arbitrary-stateful-processing shim (SURVEY.md §2.6, §7 steps 3-4)."""
