"""events operators (filled in progressively)."""
