import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
# workers must be able to import the package no matter where they start
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

FIXTURES = os.path.join(REPO, "fixtures")


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole test run (driver contract: tests own
    the session; library code never calls ray.init/shutdown)."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    # belt-and-braces: ship the package by value so workers never need to
    # import it from disk (driver environments vary)
    from ray import cloudpickle as rcp

    import org_dharts_dia_tesseract_ray as pkg
    rcp.register_pickle_by_value(pkg)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
