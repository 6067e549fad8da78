"""Large-scale training-data operations: dedup, text analysis, similarity
search, multimodal plumbing, relational aggregation helpers."""

from deduce_ray.raytune import tune_data_context

tune_data_context()
