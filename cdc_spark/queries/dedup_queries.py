"""dedup_queries — filled in incrementally."""
