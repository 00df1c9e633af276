"""scans operators (filled in progressively)."""
