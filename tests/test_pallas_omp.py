"""Full-fused Pallas OMP solver vs the XLA scan solver (interpreter mode
on CPU; compiled Mosaic parity + throughput are exercised on the real
chip by the verify flows and bench.py)."""

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu.ops.pallas_omp import omp_fused
from lyssandra_tpu.solvers.greedy import _omp_impl
from tests.conftest import make_problem
import pytest




def test_fused_omp_matches_scan_T_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=128, N=1024, T=4)
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    from jax import lax

    ref = _omp_impl(jnp.asarray(Df), jnp.asarray(Xf), 0.0, T=4,
                    eps_mode=False, precision=lax.Precision.HIGHEST)
    idx, gam, err, nsel = omp_fused(
        jnp.asarray(Df), jnp.asarray(Xf), T=4, block=512, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx))
    np.testing.assert_allclose(
        np.asarray(gam), np.asarray(ref.gamma), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(ref.err), atol=2e-4
    )
    np.testing.assert_array_equal(np.asarray(nsel), np.asarray(ref.nsel))


def test_fused_omp_matches_scan_eps_mode(rng):
    from jax import lax

    D, X, _ = make_problem(rng, p=16, K=128, N=512, T=3)
    # mixed difficulty: half the lanes scaled tiny so they converge early
    X[:, ::2] *= 0.05
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    eps = 0.3
    ref = _omp_impl(jnp.asarray(Df), jnp.asarray(Xf), eps, T=6,
                    eps_mode=True, precision=lax.Precision.HIGHEST)
    idx, gam, err, nsel = omp_fused(
        jnp.asarray(Df), jnp.asarray(Xf), T=6, eps=eps, eps_mode=True,
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(nsel), np.asarray(ref.nsel))
    np.testing.assert_allclose(
        np.asarray(gam), np.asarray(ref.gamma), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(ref.err), atol=2e-4
    )


def test_fused_eps_exit_blocks_match_scan(rng):
    """Per-block early exit (_kernel_eps_exit): grid blocks that converge
    at different steps — including a block done AT ENTRY (its scratch
    rows are never written; the zero-init epilogue must still produce the
    all-zero solve) — match the scan solver lane for lane."""
    from jax import lax

    D, X, _ = make_problem(rng, p=16, K=128, N=256, T=3)
    X[:, :64] *= 1e-6          # grid block 0: every lane done at entry
    X[:, 64:128] *= 0.05       # block 1: converges in ~1 step
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    eps = 0.3
    ref = _omp_impl(jnp.asarray(Df), jnp.asarray(Xf), eps, T=6,
                    eps_mode=True, precision=lax.Precision.HIGHEST)
    idx, gam, err, nsel = omp_fused(
        jnp.asarray(Df), jnp.asarray(Xf), T=6, eps=eps, eps_mode=True,
        block=64, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(nsel), np.asarray(ref.nsel))
    np.testing.assert_array_equal(
        np.asarray(idx), np.asarray(ref.idx * (np.arange(6)[None, :]
                                               < np.asarray(ref.nsel)[:, None]))
    )
    np.testing.assert_allclose(
        np.asarray(gam), np.asarray(ref.gamma), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(ref.err), atol=2e-4
    )


def test_exact3_split_is_lossless(rng):
    # the dk_mode='split3' fetch relies on f32 == hi + mid + lo BITWISE
    from lyssandra_tpu.ops.pallas_omp import _exact3_split

    a = jnp.asarray(
        rng.standard_normal((64, 1024)).astype(np.float32)
        * np.exp(rng.uniform(-20, 20, (64, 1024))).astype(np.float32)
    )
    hi, mid, lo = _exact3_split(a)
    back = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
            + lo.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_dk_split3_bit_exact_vs_hi(rng):
    # the one-hot products and f32 additions of the exact 3-split are all
    # exact, so dk == the gathered column in both modes: idx, gamma and
    # nsel must be BITWISE identical.  err may differ by ~1 ulp — with
    # identical inputs the only freedom left is the compiler reassociating
    # the sum(r*r) reduction between the two programs.
    D, X, _ = make_problem(rng, p=16, K=128, N=1024, T=4)
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    ref = omp_fused(jnp.asarray(Df), jnp.asarray(Xf), T=4, block=512,
                    interpret=True)
    out = omp_fused(jnp.asarray(Df), jnp.asarray(Xf), T=4, block=512,
                    dk_mode="split3", interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(ref[2]), atol=1e-6
    )


def test_fused_omp_duplicate_atoms_freeze(rng):
    # duplicate-atom dictionary: progressive factor breaks down (nu ~ 0)
    # and the lane must freeze with finite outputs, like the scan solver
    from jax import lax

    D, X, _ = make_problem(rng, p=16, K=128, N=512, T=4)
    D[:, 64:] = D[:, :64]
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    ref = _omp_impl(jnp.asarray(Df), jnp.asarray(Xf), 0.0, T=8,
                    eps_mode=False, precision=lax.Precision.HIGHEST)
    idx, gam, err, nsel = omp_fused(
        jnp.asarray(Df), jnp.asarray(Xf), T=8, block=512, interpret=True
    )
    assert np.isfinite(np.asarray(gam)).all()
    np.testing.assert_array_equal(np.asarray(nsel), np.asarray(ref.nsel))
    np.testing.assert_allclose(
        np.asarray(gam), np.asarray(ref.gamma), atol=5e-5
    )


def test_fused_wrapper_pads_odd_shapes_bitwise(rng):
    # K=100 (not lane-aligned), p=12 (not sublane-aligned), N=100: the
    # wrapper's zero-padding of rows/atoms/lanes must reproduce the scan
    # solver bitwise on idx/nsel and to fp tolerance on gamma
    from jax import lax

    from lyssandra_tpu.solvers.greedy import _omp_fused_call

    D, X, _ = make_problem(rng, p=12, K=100, N=100, T=4)
    Df, Xf = jnp.asarray(D, jnp.float32), jnp.asarray(X, jnp.float32)
    ref = _omp_impl(Df, Xf, 0.0, T=4, eps_mode=False,
                    precision=lax.Precision.HIGHEST)
    out = _omp_fused_call(Df, Xf, T=4, eps=0.0, eps_mode=False,
                          dense=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(out.nsel),
                                  np.asarray(ref.nsel))
    np.testing.assert_allclose(np.asarray(out.gamma),
                               np.asarray(ref.gamma), atol=2e-5)
    assert (np.asarray(out.idx) < 100).all()
    # dense scatter keeps the ORIGINAL K
    dense = _omp_fused_call(Df, Xf, T=4, eps=0.0, eps_mode=False,
                            dense=True, interpret=True)
    assert dense.shape == (100, 100)


@pytest.mark.slow
def test_group_omp_fused_interpret_matches_xla(rng):
    # the fused group-OMP kernel (ops/pallas_group.py) vs the XLA scan,
    # via the public route in interpret mode (r4)
    from lyssandra_tpu.solvers.greedy import group_omp

    p, K, N, gs, T = 16, 64, 48, 4, 3
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.repeat(np.arange(K // gs), gs)
    ref = np.asarray(group_omp(D, X, groups, T, fused=False))
    out = np.asarray(group_omp(D, X, groups, T, fused=True,
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_group_omp_fused_packed_matches_xla(rng):
    # the sublane-packed factor variant (VERDICT r2 #8): same selections
    # and codes up to fp reassociation; A=T*gs=12 exercises the Ap=16
    # padded packing
    from lyssandra_tpu.solvers.greedy import group_omp

    p, K, N, gs, T = 16, 64, 48, 4, 3
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.repeat(np.arange(K // gs), gs)
    ref = np.asarray(group_omp(D, X, groups, T, fused=False))
    out = np.asarray(group_omp(D, X, groups, T, fused=True,
                               interpret=True, packed=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_group_omp_fused_packed_ragged(rng):
    from lyssandra_tpu.solvers.greedy import group_omp

    p, K, N, T = 16, 62, 40, 3
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.minimum(np.arange(K) // 4, 14)
    ref = np.asarray(group_omp(D, X, groups, T, fused=False))
    out = np.asarray(group_omp(D, X, groups, T, fused=True,
                               interpret=True, packed=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_group_omp_fused_ragged_groups(rng):
    # uneven group sizes exercise the padded member slots
    from lyssandra_tpu.solvers.greedy import group_omp

    p, K, N, T = 16, 62, 40, 3
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.minimum(np.arange(K) // 4, 14)   # last group has 6 atoms
    ref = np.asarray(group_omp(D, X, groups, T, fused=False))
    out = np.asarray(group_omp(D, X, groups, T, fused=True,
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_group_omp_fused_compact(rng):
    from lyssandra_tpu.solvers.greedy import group_omp

    p, K, N, gs, T = 16, 64, 40, 4, 2
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.repeat(np.arange(K // gs), gs)
    res = group_omp(D, X, groups, T, fused=True, interpret=True,
                    dense=False)
    dense = np.asarray(group_omp(D, X, groups, T, fused=False))
    np.testing.assert_allclose(
        np.asarray(res.dense(K)), dense, atol=1e-4
    )
