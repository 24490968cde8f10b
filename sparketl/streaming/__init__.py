"""Structured Streaming operators ([EXT] — SURVEY §2.10)."""
