"""Ray Data stages: stateful annotator actor pool, triple pipeline,
checkpointed graph materialization.

No import side effects — see ``deduce_ray/ops/__init__.py`` for where the
Ray DataContext tuning is applied instead.
"""
