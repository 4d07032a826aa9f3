"""DataFrame-composed operators: extraction, spatial joins, kNN, tiling,
transform_bounds, dedup/similarity/text-analysis."""
