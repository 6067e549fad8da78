"""Large-scale training-data operations: dedup, text analysis, similarity
search, multimodal plumbing, relational aggregation helpers."""
