import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def engine():
    """Full engine with the compiled lexicon (cached across runs)."""
    from deduce_ray.engine import DeduceEngine

    return DeduceEngine()
