"""windows operators (filled in progressively)."""
