"""Structured Streaming variants of the pipeline (SURVEY §2.C streaming row)."""
