"""llm operators (filled in progressively)."""
