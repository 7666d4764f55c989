"""DataFrame-level operators: extraction, dedup, similarity, text analysis."""
