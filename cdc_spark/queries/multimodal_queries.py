"""multimodal_queries — filled in incrementally."""
