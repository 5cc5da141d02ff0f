"""Pytest fixtures: ONE Ray session per test session (driver contract)."""

from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus():
    """Tiny deterministic transcript corpus (cached under /tmp)."""
    from chunksilo_ray import datagen

    return datagen.corpus_dir(0.001)


@pytest.fixture()
def tmp_out(tmp_path):
    out = tmp_path / "out"
    yield str(out)
    shutil.rmtree(out, ignore_errors=True)
