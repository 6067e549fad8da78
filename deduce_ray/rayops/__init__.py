"""Ray Data stages: stateful annotator actor pool, triple pipeline,
checkpointed graph materialization."""

from deduce_ray.raytune import tune_data_context

tune_data_context()
