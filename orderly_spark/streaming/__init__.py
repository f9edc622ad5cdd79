"""Structured Streaming surface (SURVEY §2.9 — absent in the
reference, which is strictly batch; added per the build plan §7.1 M5
as the incremental-ingestion path)."""
