"""Denoising + feature-extraction apps vs oracle (SURVEY.md §4.5,
BASELINE config 3)."""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from lyssandra_tpu.apps import Denoiser, denoise, FeatureExtractor
from lyssandra_tpu.apps.denoise import psnr
from lyssandra_tpu.apps.features import spatial_pyramid_pool
from lyssandra_tpu.config import DenoiseConfig
from lyssandra_tpu.ops import dct_dictionary
import jax.numpy as jnp


def _toy_image(rng, n=64):
    x = np.linspace(0, 2 * np.pi, n)
    img = 100 + 60 * np.outer(np.sin(x), np.cos(x)) + 20 * np.outer(
        np.cos(2 * x), np.sin(3 * x)
    )
    return img


def test_denoise_matches_oracle_psnr(rng):
    """PSNR parity within the 0.05 dB budget (BASELINE north star)."""
    img = _toy_image(rng)
    sigma = 25.0
    noisy = img + sigma * rng.standard_normal(img.shape)
    D = oracle.dct_dictionary(8, 64)
    ref = oracle.denoise(noisy, D, sigma, T_max=16)
    cfg = DenoiseConfig(patch=8, sigma=sigma, T_max=16, block=4096)
    out = np.asarray(denoise(noisy.astype(np.float32), D, sigma, cfg=cfg))
    p_ref = oracle.psnr(ref, img)
    p_out = oracle.psnr(out.astype(np.float64), img)
    assert p_out > oracle.psnr(noisy, img)  # actually denoises
    assert abs(p_out - p_ref) < 0.05, (p_out, p_ref)


def test_denoiser_class(rng):
    img = _toy_image(rng, 48)
    noisy = img + 15.0 * rng.standard_normal(img.shape)
    den = Denoiser(dct_dictionary(8, 64),
                   DenoiseConfig(sigma=15.0, T_max=8, block=4096))
    out = np.asarray(den(noisy.astype(np.float32)))
    assert psnr(out, img) > psnr(noisy, img) + 1.0


def test_spatial_pyramid_pool_shapes(rng):
    codes = jnp.asarray(rng.standard_normal((32, 6 * 7)), jnp.float32)
    f = spatial_pyramid_pool(codes, (6, 7), levels=(1, 2))
    assert f.shape == (32 * (1 + 4),)
    # level-1 cell is the global max of |codes|
    np.testing.assert_allclose(
        np.asarray(f[:32]), np.abs(np.asarray(codes)).max(axis=1), atol=1e-6
    )


def test_feature_extractor_separates_classes(rng):
    # two texture classes; pooled sparse codes should be linearly separable
    from lyssandra_tpu.classify import LinearClassifier

    D = dct_dictionary(8, 64)
    fe = FeatureExtractor(D, patch=8, stride=8, levels=(1, 2))

    def tex_a():
        return np.outer(np.sin(np.linspace(0, 8 * np.pi, 32)),
                        np.ones(32)) * 50 + rng.standard_normal((32, 32))

    def tex_b():
        return np.outer(np.ones(32),
                        np.sin(np.linspace(0, 8 * np.pi, 32))) * 50 + \
            rng.standard_normal((32, 32))

    imgs = [tex_a() for _ in range(8)] + [tex_b() for _ in range(8)]
    y = np.array([0] * 8 + [1] * 8)
    F = np.asarray(fe.transform(imgs)).T          # (F, n)
    clf = LinearClassifier(lam=1e-3).fit(F, y)
    assert clf.score(F, y) == 1.0


def test_feature_extractor_batched_matches_per_image(rng):
    D = dct_dictionary(8, 64)
    fe = FeatureExtractor(D, patch=8, stride=4, levels=(1, 2))
    imgs = rng.standard_normal((3, 24, 24)).astype(np.float32)
    batched = np.asarray(fe.transform(imgs))
    single = np.stack(
        [np.asarray(fe.transform_image(im)) for im in imgs]
    )
    np.testing.assert_allclose(batched, single, atol=1e-5)


def test_feature_extractor_img_block_matches_unblocked(rng):
    # dataset-scale transforms chunk over images (VERDICT r1 weak #4);
    # chunked output must equal the single-block result
    D = dct_dictionary(8, 64)
    imgs = rng.standard_normal((7, 24, 24)).astype(np.float32)
    big = FeatureExtractor(D, patch=8, stride=4, levels=(1, 2),
                           img_block=64)
    small = FeatureExtractor(D, patch=8, stride=4, levels=(1, 2),
                             img_block=2)
    np.testing.assert_allclose(
        np.asarray(small.transform(imgs)), np.asarray(big.transform(imgs)),
        atol=1e-5,
    )


def test_feature_extractor_whitening_path(rng):
    # end-to-end whitened preprocessing (VERDICT r1 missing #5/#6):
    # fit the whitener on training patches, extract whitened features
    from lyssandra_tpu.ops.patches import (
        contrast_normalize, extract_patches, remove_dc,
    )
    from lyssandra_tpu.ops.whitening import Whitener

    imgs = rng.standard_normal((4, 24, 24)).astype(np.float32)
    Xs = np.concatenate(
        [np.asarray(extract_patches(im, 8, 4)) for im in imgs], axis=1
    )
    Xs, _ = remove_dc(Xs)
    Xs, _ = contrast_normalize(Xs)
    wh = Whitener().fit(Xs)

    D = dct_dictionary(8, 64)
    fe = FeatureExtractor(D, patch=8, stride=4, levels=(1,),
                          preprocess="dc+norm+whiten", whitener=wh)
    F = np.asarray(fe.transform(imgs))
    assert F.shape == (4, 64) and np.isfinite(F).all()
    # whitened features must differ from unwhitened ones
    fe0 = FeatureExtractor(D, patch=8, stride=4, levels=(1,),
                           preprocess="dc+norm")
    F0 = np.asarray(fe0.transform(imgs))
    assert np.abs(F - F0).max() > 1e-3


def test_denoise_color_matches_oracle_psnr(rng):
    # first-class RGB route (VERDICT r1 missing #1): (H, W, 3) noisy
    # image -> 3p^2-dim channel-stacked patches -> eps-mode coding over a
    # (3p^2, K) dictionary -> per-channel overlap-add blend
    from lyssandra_tpu.ops.dictionaries import dct_dictionary_color
    from lyssandra_tpu.utils import synthetic_color_image

    img = synthetic_color_image("mix", 48, seed=2)
    sigma = 25.0
    noisy = img + sigma * rng.standard_normal(img.shape)
    D = dct_dictionary_color(8, 64)
    ref = oracle.denoise(noisy, np.asarray(D, np.float64), sigma, T_max=12)
    cfg = DenoiseConfig(patch=8, sigma=sigma, T_max=12, block=4096)
    out = np.asarray(denoise(noisy.astype(np.float32), D, sigma, cfg=cfg))
    assert out.shape == img.shape
    p_ref = oracle.psnr(ref, img)
    p_out = oracle.psnr(out.astype(np.float64), img)
    assert p_out > oracle.psnr(noisy, img)
    assert abs(p_out - p_ref) < 0.05, (p_out, p_ref)


def test_denoise_adaptive_color(rng):
    # adaptive color pipeline: K-SVD on the noisy RGB image's own color
    # patches (learned (3p^2, K) dictionary) must beat/tie the replicated
    # DCT baseline and actually denoise
    from lyssandra_tpu.apps import denoise_adaptive
    from lyssandra_tpu.ops.dictionaries import dct_dictionary_color
    from lyssandra_tpu.utils import synthetic_color_image

    img = synthetic_color_image("texture", 64, seed=5)
    noisy = (img + 25.0 * rng.standard_normal(img.shape)).astype(np.float32)
    cfg = DenoiseConfig(sigma=25.0, T_max=8, block=8192)
    den_dct = denoise(noisy, dct_dictionary_color(8, 64), 25.0, cfg=cfg)
    den_ad = denoise_adaptive(noisy, 25.0, cfg=cfg, K=64, n_iter=4,
                              n_train=2000)
    p_dct = oracle.psnr(np.asarray(den_dct, np.float64), img)
    p_ad = oracle.psnr(np.asarray(den_ad, np.float64), img)
    assert p_ad > p_dct - 0.1, (p_ad, p_dct)
    assert p_ad > oracle.psnr(np.asarray(noisy, np.float64), img)


def test_denoise_adaptive_beats_dct(rng):
    # the full Elad-Aharon pipeline: K-SVD trained on the noisy image's
    # own patches must beat (or tie) the fixed-DCT dictionary
    from lyssandra_tpu.apps import denoise_adaptive
    from lyssandra_tpu import DenoiseConfig, oracle
    from lyssandra_tpu.utils import synthetic_image

    img = synthetic_image("texture", 96, seed=5)
    noisy = (img + 25.0 * rng.standard_normal(img.shape)).astype(np.float32)
    cfg = DenoiseConfig(sigma=25.0, T_max=8, block=8192)
    den_dct = denoise(noisy, dct_dictionary(8, 64), 25.0, cfg=cfg)
    den_ad = denoise_adaptive(noisy, 25.0, cfg=cfg, K=64, n_iter=4,
                              n_train=2000)
    p_dct = oracle.psnr(np.asarray(den_dct, np.float64), img)
    p_ad = oracle.psnr(np.asarray(den_ad, np.float64), img)
    assert p_ad > p_dct - 0.1, (p_ad, p_dct)
    assert p_ad > oracle.psnr(np.asarray(noisy, np.float64), img)


def test_eps_two_phase_device_resident_straggler_loop(rng):
    """The device-resident two-phase coder (apps.denoise._eps_two_phase)
    equals the single-pass XLA eps solve — including when the straggler
    while_loop must actually run (T1 chosen too small, cap smaller than
    the straggler count so it takes multiple compaction rounds)."""
    from lyssandra_tpu.apps.denoise import _eps_two_phase
    from lyssandra_tpu.solvers.greedy import _omp_impl, _HI

    p, K, N, T_max = 16, 64, 96, 6
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    # signals built from 4-6 atoms so a T1=2 first pass leaves many
    # lanes unconverged
    G0 = np.zeros((K, N), np.float32)
    for i in range(N):
        sup = rng.choice(K, size=4 + (i % 3), replace=False)
        G0[sup, i] = rng.standard_normal(len(sup))
    X = (D @ G0).astype(np.float32)
    eps = 1e-3
    ref = np.asarray(
        _omp_impl(jnp.asarray(D), jnp.asarray(X), eps, T=T_max,
                  eps_mode=True, precision=_HI).dense(K)
    )
    out = np.asarray(
        _eps_two_phase(jnp.asarray(D), jnp.asarray(X), eps=eps, T1=2,
                       T_max=T_max, cap=16, interpret=True)
    )
    # sanity: the loop genuinely had stragglers to fix
    assert (np.abs(out).astype(bool).sum(0) > 2).any()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_eps_two_phase_energy_order_identical(rng):
    """order='energy' (in-program difficulty sort, VERDICT r3 task #6)
    must return EXACTLY what raster order returns: lanes are coded
    independently, the per-block early exit only skips steps for
    already-frozen lanes, and the inverse permutation restores
    extraction order before the dense scatter."""
    from lyssandra_tpu.apps.denoise import _eps_two_phase

    p, K, N, T_max = 16, 64, 80, 6
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    G0 = np.zeros((K, N), np.float32)
    for i in range(N):
        sup = rng.choice(K, size=1 + (i % 5), replace=False)
        G0[sup, i] = rng.standard_normal(len(sup))
    X = (D @ G0 + 0.01 * rng.standard_normal((p, N))).astype(np.float32)
    a = np.asarray(
        _eps_two_phase(jnp.asarray(D), jnp.asarray(X), eps=0.05, T1=4,
                       T_max=T_max, cap=16, interpret=True)
    )
    b = np.asarray(
        _eps_two_phase(jnp.asarray(D), jnp.asarray(X), eps=0.05, T1=4,
                       T_max=T_max, cap=16, order="energy",
                       interpret=True)
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_eps_two_phase_no_stragglers(rng):
    """Common case: every lane converges in phase 1 (zero loop trips)."""
    from lyssandra_tpu.apps.denoise import _eps_two_phase
    from lyssandra_tpu.solvers.greedy import _omp_impl, _HI

    p, K, N, T_max = 16, 64, 64, 12
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    G0 = np.zeros((K, N), np.float32)
    for i in range(N):
        sup = rng.choice(K, size=3, replace=False)
        G0[sup, i] = rng.standard_normal(3)
    X = (D @ G0).astype(np.float32)
    eps = 1e-3
    ref = np.asarray(
        _omp_impl(jnp.asarray(D), jnp.asarray(X), eps, T=12,
                  eps_mode=True, precision=_HI).dense(K)
    )
    out = np.asarray(
        _eps_two_phase(jnp.asarray(D), jnp.asarray(X), eps=eps, T1=10,
                       T_max=12, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)
