"""scalar function queries (F1-F10)."""
