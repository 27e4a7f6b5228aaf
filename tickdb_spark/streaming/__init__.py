"""Structured Streaming surface: streaming ingest into the tick warehouse
and watermarked windowed aggregation (SURVEY.md §2.3 — the reference has
no streaming; late data there is just an out-of-order insert)."""
