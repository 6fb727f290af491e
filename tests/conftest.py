"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """1,000-doc deterministic KNA corpus + truth (shared across tests)."""
    from dedupe_ray.fixtures import generate_kna_corpus

    return generate_kna_corpus(1000, 42)
