"""filters operators (filled in progressively)."""
