"""DataFrame-level operators: expansion, linking, dedup, similarity, stats."""
