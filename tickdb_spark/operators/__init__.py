"""Custom operators the reference lacks but a complete engine needs:
as-of joins, dedup family, similarity search, text analysis, multimodal
column plumbing. All composed from built-in DataFrame ops where semantics
allow; Pandas UDFs only where genuinely required."""
