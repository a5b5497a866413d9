"""Patch-based image denoising (Elad & Aharon 2006; BASELINE config 3).

Pipeline (oracle.denoise parity, SURVEY.md §3.3):
  noisy image -> all overlapping p x p patches -> DC removal ->
  error-constrained Batch-OMP with eps = gain * p * sigma ->
  patch reconstruction -> overlap-add blend
  (lam*y + sum R^T D gamma) / (lam + counts) -> PSNR.

The eps-stopping makes per-patch trip counts data-dependent; the batched
solver runs all patches to T_max with converged lanes frozen by the done
mask (bit-stable for finished lanes).  Large images are coded in fixed-size
blocks so every block reuses one compiled executable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lyssandra_tpu.config import DenoiseConfig
from lyssandra_tpu.ops.pallas_patches import fused_patch_pipeline
from lyssandra_tpu.ops.patches import weighted_reconstruct
from lyssandra_tpu.solvers.encoder import SparseEncoder


class Denoiser:
    """Reference-mirroring denoiser: ``denoise(img) -> img_hat``.

    D: unit-norm dictionary over p x p patches (e.g. DCT or K-SVD-learned).
    """

    def __init__(self, D, cfg: DenoiseConfig = DenoiseConfig(), *,
                 mesh=None):
        self.D = jnp.asarray(D, jnp.float32)
        self.cfg = cfg
        self.mesh = mesh

    def _eps_codes(self, Xc, eps: float) -> jax.Array:
        """Error-constrained codes with a two-phase fast path.

        Measured (512^2, sigma=25): no denoise patch uses more than 8
        atoms (barbara-class max 6, lena-class max 8), so one fused-kernel
        pass capped at T=10 covers everything at the fused solver's rate;
        a single host fetch of the convergence mask guards correctness —
        a lane that hits the cap unconverged (none, empirically; the
        2-atom margin keeps borderline eps lanes off the cap) triggers
        the exact XLA T_max path for the whole batch.
        """
        cfg = self.cfg
        from lyssandra_tpu.solvers.greedy import (
            _fused_supported, _omp_fused_call, _omp_impl, _HI,
        )
        import numpy as np

        T1 = min(10, cfg.T_max)
        if self.mesh is None and cfg.T_max > T1 and _fused_supported(
            self.D, Xc, _HI, "f32", None
        ):
            res = _omp_fused_call(
                self.D, Xc, T=T1, eps=float(eps), eps_mode=True,
                dense=False,
            )
            bad = np.asarray((res.nsel == T1) & (res.err > eps * eps))
            nbad = int(bad.sum())
            if nbad == 0:
                return res.dense(self.D.shape[1])
            if nbad <= 4096:
                # re-solve just the stragglers at full T_max (greedy
                # pursuit is deterministic, so a from-scratch re-solve
                # equals the single-pass T_max result on those lanes)
                cols = np.where(bad)[0]
                padn = -(-nbad // 512) * 512
                colp = np.zeros(padn, np.int32)
                colp[:nbad] = cols
                Xs = jnp.take(Xc, jnp.asarray(colp), axis=1)
                rs = _omp_impl(self.D, Xs, float(eps), T=cfg.T_max,
                               eps_mode=True, precision=_HI)
                Gamma = res.dense(self.D.shape[1])
                return Gamma.at[:, jnp.asarray(cols)].set(
                    rs.dense(self.D.shape[1])[:, :nbad]
                )
        enc = SparseEncoder(
            "bomp", {"T": cfg.T_max, "eps": eps},
            block=cfg.block, mesh=self.mesh, check_atoms=False,
        )
        return enc.encode(Xc, self.D)

    def __call__(self, noisy, sigma: float | None = None) -> jax.Array:
        cfg = self.cfg
        sigma = float(cfg.sigma if sigma is None else sigma)
        p = cfg.patch
        noisy = jnp.asarray(noisy, jnp.float32)

        if noisy.ndim == 3:
            # color: C p^2-dim channel-stacked patches over a (C p^2, K)
            # dictionary — the solver path is channel-agnostic, only the
            # patch pipeline and the eps target (sqrt(dim) sigma) change
            from lyssandra_tpu.ops.patches import extract_patches, remove_dc

            Xc, means = remove_dc(extract_patches(noisy, p))
        else:
            # fused Pallas extract+DC on TPU; XLA ops elsewhere
            Xc, means, _ = fused_patch_pipeline(noisy, p, do_dc=True)
        eps = cfg.gain * math.sqrt(Xc.shape[0]) * sigma
        Gamma = self._eps_codes(Xc, eps)
        Xhat = self.D @ Gamma + means[None, :]
        lam_w = cfg.lam / max(sigma, 1e-12)
        return weighted_reconstruct(Xhat, noisy, p, lam_w)


def denoise(noisy, D, sigma: float, *, cfg: DenoiseConfig | None = None,
            mesh=None) -> jax.Array:
    """Functional entry point (oracle.denoise parity)."""
    cfg = cfg or DenoiseConfig()
    return Denoiser(D, cfg, mesh=mesh)(noisy, sigma)


def denoise_adaptive(
    noisy, sigma: float, *, cfg: DenoiseConfig | None = None,
    K: int = 256, n_iter: int = 12, n_train: int = 30000, mesh=None,
    return_dictionary: bool = False,
):
    """Full Elad-Aharon 2006 adaptive pipeline: train a K-SVD dictionary
    on the NOISY image's own patches with the same error-constrained
    coder, then denoise with it.  Beats the fixed-DCT pipeline by
    ~1.1-1.4 dB on the standard test images (benchmarks config 3)."""
    import numpy as np

    from lyssandra_tpu.config import KSVDConfig
    from lyssandra_tpu.dict_learning.ksvd import KSVDLearner
    from lyssandra_tpu.utils.datasets import patch_dataset

    cfg = cfg or DenoiseConfig(sigma=sigma)
    noisy_np = np.asarray(noisy, np.float64)
    dim = cfg.patch * cfg.patch * (
        noisy_np.shape[2] if noisy_np.ndim == 3 else 1
    )
    eps = cfg.gain * math.sqrt(dim) * float(sigma)
    train = patch_dataset(
        [noisy_np], p=cfg.patch, n_patches=n_train, seed=3,
    ).astype(np.float32)
    enc = SparseEncoder("bomp", {"T": cfg.T_max, "eps": eps},
                        check_atoms=False, mesh=mesh)
    learner = KSVDLearner(
        KSVDConfig(K=K, T=cfg.T_max, n_iter=n_iter, init="dct"),
        encoder=enc, mesh=mesh,
    ).fit(train)
    out = Denoiser(learner.D_, cfg, mesh=mesh)(noisy, sigma)
    return (out, learner.D_) if return_dictionary else out


def psnr(a, b, peak: float = 255.0) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(peak * peak / mse))
