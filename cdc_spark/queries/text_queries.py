"""text_queries — filled in incrementally."""
