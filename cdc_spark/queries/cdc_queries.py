"""cdc_queries — filled in incrementally."""
