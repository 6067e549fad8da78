"""Ray Data stages: stateful annotator actor pool, triple pipeline,
checkpointed graph materialization."""
