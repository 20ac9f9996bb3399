"""similarity_queries — filled in incrementally."""
