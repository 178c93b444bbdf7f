"""Streaming queries (filled by M4)."""
