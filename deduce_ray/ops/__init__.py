"""Large-scale training-data operations: dedup, text analysis, similarity
search, multimodal plumbing, relational aggregation helpers.

Importing this package has no side effects: the Ray DataContext tuning in
:mod:`deduce_ray.raytune` is applied by the engine's own entry surfaces
(corpus/sources readers, CLI, bench, driver contract) at dataset-creation
time, never by library import — embedders composing these ops over their
own datasets keep their own context unless they opt in via
``deduce_ray.raytune.tune_data_context()``.
"""
