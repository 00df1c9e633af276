"""udfs operators (filled in progressively)."""
