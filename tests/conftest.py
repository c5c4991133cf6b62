"""Shared fixtures. Ray is initialised ONCE per pytest session."""

import sys

import pytest
from hypothesis import settings

# deterministic fuzz in CI: the differential fuzzers have caught real
# divergences (dot-segment joins, '//' collapse) — counterexamples found in
# exploratory runs get fixed and pinned, but the gate itself must not flake.
# For exploratory fuzzing run: pytest -p no:cacheprovider --hypothesis-seed=random
settings.register_profile("ci", derandomize=True, max_examples=300)
settings.load_profile("ci")

# Make the reference implementation importable for differential tests
# (read-only; we run it, never copy it).
REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


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
    yield ray
    ray.shutdown()
