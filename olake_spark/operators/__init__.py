"""Engine operators: merge/upsert replay, dedup, similarity, text analysis."""
