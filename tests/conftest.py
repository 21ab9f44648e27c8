import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corrupt(tmp_path_factory):
    from rayskema.testgen import write_fixture

    d = str(tmp_path_factory.mktemp("fix") / "corrupt")
    write_fixture(d, 20000, corrupt=True)
    return d


@pytest.fixture(scope="session")
def fixture_clean(tmp_path_factory):
    from rayskema.testgen import write_fixture

    d = str(tmp_path_factory.mktemp("fix") / "clean")
    write_fixture(d, 8000, corrupt=False)
    return d


@pytest.fixture(scope="session")
def fixture_drifted(tmp_path_factory):
    from rayskema.testgen import write_fixture

    d = str(tmp_path_factory.mktemp("fix") / "drifted")
    write_fixture(d, 8000, corrupt=False, drifted=True)
    return d
