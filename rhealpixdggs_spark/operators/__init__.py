"""DataFrame-to-DataFrame planners: spatial joins, skew-aware
aggregation, kNN, dedup, similarity search, tiling."""
