import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_sf(tmp_path_factory):
    """A tiny derived dataset (own GEORAY scale) for fast end-to-end tests."""
    from georay import datagen

    sf_dir = "/root/testdata/sf0.001"
    paths = datagen.ensure_tables(sf_dir)
    return sf_dir, paths


@pytest.fixture(scope="session")
def rand_points():
    rs = np.random.RandomState(7)
    lon = rs.uniform(-180, 180, 4000)
    lat = rs.uniform(-85, 85, 4000)
    return np.column_stack([lon, lat])
