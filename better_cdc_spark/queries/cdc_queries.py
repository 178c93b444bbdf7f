"""CDC pipeline queries (filled by M3)."""
