"""Structured Streaming operators (the reference has no streaming surface;
SURVEY.md §2.5 — supplied by Spark, packaged here)."""
