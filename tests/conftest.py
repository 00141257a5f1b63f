import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sandbox page-fault mitigation (see bench.py header): keep big allocations
# on the heap so pages fault once per worker — set before Ray spawns workers
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1099511627776")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
