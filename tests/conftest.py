"""Session-scoped Ray fixture — Ray initialised ONCE per pytest session."""

import os
import shutil
import tempfile

import pytest

# Hermetic dedup checkpoint: the dedup/curation chain persists its
# verified-pair stage across processes (queries._dedup_ckpt_root).  Tests
# must never read a checkpoint written by an OLDER code revision, so each
# pytest session gets a fresh root (module import time — before any test
# imports raykg.pipelines.queries).
_CKPT = tempfile.mkdtemp(prefix="raykg_test_dedup_ckpt_")
os.environ["RAYKG_DEDUP_CKPT"] = _CKPT


def pytest_sessionfinish(session, exitstatus):
    shutil.rmtree(_CKPT, ignore_errors=True)


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()
