"""Structured Streaming surface: windowed event aggregation with
watermarks (SURVEY.md §2.8 north star)."""
