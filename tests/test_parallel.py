"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.6).

The coding path is embarrassingly parallel over patches, so sharded vs
single-device results must agree to fp equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lyssandra_tpu.parallel import (
    ksvd_train_step,
    make_mesh,
    replicate,
    shard_patches,
    sharded_ksvd_step,
)
from lyssandra_tpu.solvers import batch_omp
from lyssandra_tpu.solvers.encoder import SparseEncoder
from tests.conftest import make_problem


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)


def test_sharded_encode_equals_single_device(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=4, dtype=np.float32)
    ref = np.asarray(batch_omp(jnp.asarray(D), jnp.asarray(X), 4))
    mesh = make_mesh()
    Xs = shard_patches(jnp.asarray(X), mesh)
    Ds = replicate(jnp.asarray(D), mesh)
    out = np.asarray(batch_omp(Ds, Xs, 4))
    # not bitwise: XLA tiles the per-shard matmuls differently than the
    # full-array ones, so accumulation order differs by ~1 ulp
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_encoder_with_mesh(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=160, T=4, dtype=np.float32)
    ref = np.asarray(
        SparseEncoder("bomp", {"T": 4}, block=64).encode(X, D)
    )
    mesh = make_mesh()
    out = np.asarray(
        SparseEncoder("bomp", {"T": 4}, block=64, mesh=mesh).encode(X, D)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_ksvd_step_executes(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=64, T=4, dtype=np.float32)
    mesh = make_mesh()
    step = sharded_ksvd_step(mesh, T=4)
    D2, G2 = step(jnp.asarray(X), jnp.asarray(D))
    ref_D, ref_G = ksvd_train_step(jnp.asarray(X), jnp.asarray(D), T=4)
    np.testing.assert_allclose(np.asarray(D2), np.asarray(ref_D), atol=1e-5)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(ref_G), atol=1e-4)


def test_sharded_ksvd_step_model_axis(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=64, T=4, dtype=np.float32)
    mesh = make_mesh(data=4, model=2)
    step = sharded_ksvd_step(mesh, T=4, model_shard_atoms=True)
    D2, G2 = step(jnp.asarray(X), jnp.asarray(D))
    ref_D, ref_G = ksvd_train_step(jnp.asarray(X), jnp.asarray(D), T=4)
    np.testing.assert_allclose(np.asarray(D2), np.asarray(ref_D), atol=1e-5)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(ref_G), atol=1e-4)


def test_sharded_ksvd_step_forwards_exact(rng):
    # VERDICT r1 weak #5: exact/svd_iters must reach ksvd_train_step
    D, X, _ = make_problem(rng, p=16, K=32, N=64, T=4, dtype=np.float32)
    mesh = make_mesh()
    step = sharded_ksvd_step(mesh, T=4, exact=True, svd_iters=5)
    D2, G2 = step(jnp.asarray(X), jnp.asarray(D))
    ref_D, ref_G = ksvd_train_step(
        jnp.asarray(X), jnp.asarray(D), T=4, exact=True, svd_iters=5
    )
    np.testing.assert_allclose(np.asarray(D2), np.asarray(ref_D), atol=1e-5)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(ref_G), atol=1e-4)
    # and the exact step genuinely differs from the approx one
    apx_D, _ = ksvd_train_step(jnp.asarray(X), jnp.asarray(D), T=4)
    assert not np.allclose(np.asarray(D2), np.asarray(apx_D), atol=1e-6)


@pytest.mark.slow
def test_public_ksvd_learner_sharded_matches_single(rng):
    # VERDICT r1 weak #6: the public class (what users hold) must train
    # multi-chip, not just the private sharded step
    from lyssandra_tpu import KSVDConfig, KSVDLearner

    D, X, _ = make_problem(rng, p=16, K=24, N=64, T=3, dtype=np.float32)
    cfg = KSVDConfig(K=24, T=3, n_iter=3, replace_dead=False, seed=0)
    a = KSVDLearner(cfg).fit(X)
    mesh = make_mesh()
    b = KSVDLearner(cfg, mesh=mesh).fit(X)
    np.testing.assert_allclose(
        np.asarray(b.D_), np.asarray(a.D_), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.Gamma_), np.asarray(a.Gamma_), atol=2e-3
    )


def test_omp_model_sharded_matches_replicated(rng):
    # huge-K path: dictionary atom-sharded over 'model', patches over
    # 'data'; per-patch output must equal the replicated solver
    from lyssandra_tpu.parallel.model_sharded import omp_model_sharded
    from lyssandra_tpu.solvers import omp

    D, X, _ = make_problem(rng, p=16, K=128, N=64, T=4, dtype=np.float32)
    mesh = make_mesh(data=2, model=4)
    G_sh = np.asarray(omp_model_sharded(D, X, 4, mesh=mesh))
    G_ref = np.asarray(omp(jnp.asarray(D), jnp.asarray(X), 4))
    np.testing.assert_allclose(G_sh, G_ref, atol=1e-5)


def test_omp_model_sharded_eps_mode(rng):
    from lyssandra_tpu.parallel.model_sharded import omp_model_sharded
    from lyssandra_tpu.solvers import omp

    D, X, _ = make_problem(rng, p=16, K=128, N=64, T=3, dtype=np.float32)
    X[:, ::2] *= 0.05
    mesh = make_mesh(data=2, model=4)
    r_sh = omp_model_sharded(D, X, 6, eps=0.3, mesh=mesh, dense=False)
    r_ref = omp(jnp.asarray(D), jnp.asarray(X), 6, eps=0.3, dense=False)
    np.testing.assert_array_equal(
        np.asarray(r_sh.nsel), np.asarray(r_ref.nsel)
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.gamma), np.asarray(r_ref.gamma), atol=1e-5
    )
