"""Barcode scaffolding (SURVEY.md §2.10)."""
