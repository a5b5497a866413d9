"""Test environment: force an 8-device CPU platform (SURVEY.md §4.6).

The TPU analogue of fake backends: sharding unit tests run on a virtual
8-device CPU mesh; real-chip runs happen only in bench.py.

Note: this machine's sitecustomize registers the 'axon' TPU plugin and sets
``jax_platforms="axon,cpu"`` at interpreter start, overriding the
JAX_PLATFORMS env var — so we must update the jax config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full suite, ~15+ min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy integration test, skipped unless --runslow "
        "(VERDICT r2 task #10: default `pytest -q` stays under ~5 min)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_problem(rng, p=16, K=32, N=64, T=4, dtype=np.float64):
    """Small random unit-norm dictionary + signals that are noisy T-sparse
    combinations (so greedy recovery is well-posed)."""
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Gamma = np.zeros((K, N))
    for n in range(N):
        idx = rng.choice(K, T, replace=False)
        Gamma[idx, n] = rng.standard_normal(T)
    X = D @ Gamma + 0.01 * rng.standard_normal((p, N))
    return D.astype(dtype), X.astype(dtype), Gamma


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free accumulated compiled-executable state after each test module.

    The full --runslow suite compiles many hundreds of XLA:CPU programs
    in one process; late in such marathon runs the XLA:CPU compiler has
    segfaulted inside backend_compile_and_load at a WANDERING site (r5:
    twice in test_properties' debug_nans compile, then — after an
    unrelated code shuffle — in a pallas interpret compile; module
    subsets and the fast suite never crash, and each crashing compile
    succeeds in a fresh process).  Clearing caches between modules
    bounds the accumulated compiler state; the cost is per-module
    recompiles of shared helpers.
    """
    yield
    import jax

    jax.clear_caches()
