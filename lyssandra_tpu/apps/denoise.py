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

    def __call__(self, noisy, sigma: float | None = None) -> jax.Array:
        cfg = self.cfg
        sigma = float(cfg.sigma if sigma is None else sigma)
        p = cfg.patch
        noisy = jnp.asarray(noisy, jnp.float32)

        # fused Pallas extract+DC on TPU; XLA ops elsewhere
        Xc, means, _ = fused_patch_pipeline(noisy, p, do_dc=True)
        eps = cfg.gain * p * sigma
        enc = SparseEncoder(
            "bomp", {"T": cfg.T_max, "eps": eps},
            block=cfg.block, mesh=self.mesh, check_atoms=False,
        )
        Gamma = enc.encode(Xc, self.D)
        Xhat = self.D @ Gamma + means[None, :]
        lam_w = cfg.lam / max(sigma, 1e-12)
        return weighted_reconstruct(Xhat, noisy, p, lam_w)


def denoise(noisy, D, sigma: float, *, cfg: DenoiseConfig | None = None,
            mesh=None) -> jax.Array:
    """Functional entry point (oracle.denoise parity)."""
    cfg = cfg or DenoiseConfig()
    return Denoiser(D, cfg, mesh=mesh)(noisy, sigma)


def psnr(a, b, peak: float = 255.0) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(peak * peak / mse))
