"""LLM-data-pipeline queries (filled by M5)."""
