"""Fused Pallas patch-pipeline kernel vs oracle (interpreter mode on the
CPU test platform; the compiled Mosaic path is exercised on the real chip
by the verify flows and the denoiser)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lyssandra_tpu import oracle
from lyssandra_tpu.ops.pallas_patches import (
    fused_patch_pipeline,
    fused_patch_pipeline_p1,
)


def _ref(img, p, do_dc, do_norm):
    X = oracle.extract_patches(img.astype(np.float64), p)
    Xc, m = oracle.remove_dc(X)
    if do_dc:
        X = Xc
    Xn, s = oracle.contrast_normalize(X)
    if do_norm:
        X = Xn
    return X, m, s


@pytest.mark.parametrize("shape,do_dc,do_norm", [
    ((32, 40), True, False),     # the denoiser configuration
    ((33, 47), True, True),      # awkward (non-tile-aligned) shape
    ((24, 24), False, False),    # raw extraction
])
@pytest.mark.slow
def test_fused_pipeline_matches_oracle(rng, shape, do_dc, do_norm):
    img = rng.standard_normal(shape).astype(np.float32)
    X, M, S = fused_patch_pipeline_p1(
        jnp.asarray(img), 8, do_dc=do_dc, do_norm=do_norm, interpret=True
    )
    # oracle's contrast scales are computed post-DC only when DC is on
    ref = oracle.extract_patches(img.astype(np.float64), 8)
    refc, refm = oracle.remove_dc(ref)
    base = refc if do_dc else ref
    refn, refs = oracle.contrast_normalize(base)
    want = refn if do_norm else base
    np.testing.assert_allclose(np.asarray(X), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(M), refm, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S), refs, atol=1e-4)


def test_fused_select_matches_xla_pair(rng):
    # the OMP selection kernel (corr+argmax fused in VMEM) must pick the
    # same atom as the XLA matmul + max/min-iota pair, ties included
    import jax.numpy as jnp
    from jax import lax

    from lyssandra_tpu.ops.pallas_select import select_abs_argmax
    from lyssandra_tpu.solvers.greedy import _argmax_abs

    r = rng.standard_normal((1024, 16)).astype(np.float32)
    D = rng.standard_normal((16, 256)).astype(np.float32)
    # inject exact ties: lane 0's residual correlates identically with
    # atoms 3 and 7
    D[:, 7] = D[:, 3]
    want = np.asarray(_argmax_abs(
        jnp.matmul(jnp.asarray(r), jnp.asarray(D),
                   precision=lax.Precision.HIGHEST)))
    got = np.asarray(select_abs_argmax(
        jnp.asarray(r), jnp.asarray(D), block=512, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_fused_pipeline_whitening_epilogue(rng):
    # north-star fusion: extract + DC + norm + ZCA whiten in one kernel;
    # parity vs the oracle pipeline composed with Whitener.transform
    from lyssandra_tpu.ops.whitening import Whitener

    img = rng.standard_normal((33, 47)).astype(np.float32)
    ref = oracle.extract_patches(img.astype(np.float64), 8)
    refc, _ = oracle.remove_dc(ref)
    refn, _ = oracle.contrast_normalize(refc)
    wh = Whitener().fit(jnp.asarray(refn, jnp.float32))
    want = np.asarray(wh.transform(jnp.asarray(refn, jnp.float32)))

    X, _, _ = fused_patch_pipeline_p1(
        jnp.asarray(img), 8, do_dc=True, do_norm=True,
        whiten=wh.fused_params(), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(X), want, atol=2e-4)


def test_fused_pipeline_fallback_strided_whiten(rng):
    from lyssandra_tpu.ops.whitening import Whitener

    img = rng.standard_normal((32, 32)).astype(np.float32)
    ref = oracle.extract_patches(img.astype(np.float64), 8, stride=4)
    refc, _ = oracle.remove_dc(ref)
    wh = Whitener().fit(jnp.asarray(refc, jnp.float32))
    want = np.asarray(wh.transform(jnp.asarray(refc, jnp.float32)))
    X, _, _ = fused_patch_pipeline(
        jnp.asarray(img), 8, stride=4, do_dc=True,
        whiten=wh.fused_params(),
    )
    np.testing.assert_allclose(np.asarray(X), want, atol=2e-4)


def test_fused_pipeline_fallback_strided(rng):
    # non-unit stride routes through the XLA path with the same contract
    img = rng.standard_normal((32, 32)).astype(np.float32)
    X, M, S = fused_patch_pipeline(jnp.asarray(img), 8, stride=4, do_dc=True)
    ref = oracle.extract_patches(img.astype(np.float64), 8, stride=4)
    refc, refm = oracle.remove_dc(ref)
    np.testing.assert_allclose(np.asarray(X), refc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(M), refm, atol=1e-5)
