"""streaming_queries — filled in incrementally."""
