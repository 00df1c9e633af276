"""setops operators (filled in progressively)."""
