"""ordering operators (filled in progressively)."""
