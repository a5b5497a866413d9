"""Frozen dataclass configs — the rebuild's replacement for the reference's
global YAML config (SURVEY.md §5: explicit construction, no globals).

A tiny ``from_yaml`` helper is provided for experiment scripts.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class OMPConfig:
    """Greedy-solver config.

    T: max atoms (fixed trip count of the lax.scan).
    eps: residual-norm stopping target (None = T-sparse mode).
    """

    T: int = 8
    eps: float | None = None
    precision: str = "highest"   # MXU precision for Gram / correlation matmuls


@dataclass(frozen=True)
class LassoConfig:
    """Feature-sign-search config (batched while_loop)."""

    lam: float = 0.1
    max_active: int = 64         # fixed active-set capacity (static shapes)
    max_iter: int = 100          # outer activation steps
    max_inner: int = 20          # feature-sign refinement steps per activation


@dataclass(frozen=True)
class KSVDConfig:
    K: int = 512
    T: int = 8
    n_iter: int = 20
    init: str = "data"           # random | data | dct
    exact_svd: bool = False      # exact rank-1 SVD vs approx power step
    svd_iters: int = 3           # power iterations when exact_svd=True
    replace_dead: bool = True
    min_use: int = 1
    max_coherence: float = 0.99
    # atoms updated per sweep step: 1 = exact sequential Gauss-Seidel
    # (oracle semantics); B>1 batches B atoms into block GEMMs (Jacobi
    # within the block — iteration-level tolerance, SURVEY.md §3.2),
    # cutting sweep time ~B-fold.  See ksvd.ksvd_atom_update.
    atom_block: int = 1
    # code-matrix representation during fit: 'dense' (K, N) Gamma,
    # 'compact' idx/gamma (N, T) triplets (no (K, N) array anywhere —
    # the huge-N route), or 'auto' (compact when dense Gamma would
    # exceed ~1 GB).  Compact implies block atom updates (>= 8).
    codes: str = "auto"
    seed: int = 0


@dataclass(frozen=True)
class OnlineDLConfig:
    K: int = 1024
    lam: float = 0.15
    batch_size: int = 4096       # lanes per coding call (chip sweet spot
    #                              is thousands; 256-lane batches left the
    #                              MXU ~99% idle in round 1)
    n_sweeps: int = 1
    beta: float = 1.0            # forgetting factor on sufficient statistics
    chunk_batches: int = 8       # minibatches scanned per device program
    fs_max_active: int = 64      # feature-sign active-set capacity
    fs_max_iter: int = 60        # feature-sign outer iterations (in-scan)
    fs_max_inner: int = 6        # refinement budget (r6, ab_fs_inner.json)
    fs_warm_start: int = 0       # OMP-seed atoms for the in-scan coder.
    #                              MEASURED NEGATIVE as a default (r6,
    #                              chip, 50k color patches: ws4 5512 vs
    #                              ws0 6835 p/s): in-scan the seed runs
    #                              the XLA-scan OMP (the fused kernel
    #                              that makes the host-level seed free
    #                              is a custom call = fusion barrier
    #                              inside the epoch program), and on the
    #                              partially-trained mid-epoch
    #                              dictionary the greedy support matches
    #                              the lasso support less well.  Kept as
    #                              an opt-in knob.
    fs_cold_unroll: int | None = None  # unrolled growing-dimension cold
    #                              start for the in-scan coder (r8).
    #                              None -> 0: measured a monotone LOSS
    #                              in-scan (ab_online_unroll.json; see
    #                              OnlineDictionaryLearner.
    #                              _resolve_cold_unroll) even though the
    #                              dispatch-level coder wins 3.3x at
    #                              depth 28.  Kept as an opt-in knob.
    code_blocks: int = 4         # coder sub-blocks per minibatch: active-
    #                              set while_loops ride each block's
    #                              slowest lane, so coding bs lanes as
    #                              code_blocks sequential sub-blocks pays
    #                              with NO per-sub-block dispatch cost
    #                              inside the epoch scan.  Chip A/B at
    #                              50k color patches (r6): cb1 5577 /
    #                              cb2 6927 / cb4 7349 / cb8 6828 p/s,
    #                              objectives identical — 1024-lane
    #                              sub-blocks are the in-program optimum
    #                              (vs 2048 at the dispatch level,
    #                              ab_fs_block.json).  The dictionary
    #                              update still sees the full minibatch
    seed: int = 0


@dataclass(frozen=True)
class LCKSVDConfig:
    K: int = 512
    T: int = 8
    n_iter: int = 10
    # weights tuned for unit-norm inputs (sqrt applied in the stack);
    # large values let the label blocks dominate the stacked signal and
    # hurt accuracy.  Chosen by a validation-split sweep on the digits
    # benchmark (r2: alpha in {.25,1,4} x beta in {.125,.5,2} x K x T —
    # best val 97.1% at alpha=.25, beta=.5, T=8)
    alpha: float = 0.25          # label-consistency weight
    beta: float = 0.5            # classification weight
    seed: int = 0


@dataclass(frozen=True)
class DenoiseConfig:
    patch: int = 8
    sigma: float = 25.0
    gain: float = 1.15
    lam: float = 0.5
    T_max: int = 32
    block: int = 16384           # patches coded per device step (HBM chunking)
    # lane ordering fed to the eps-exit kernel's 512-lane blocks:
    # "raster" (extraction order, DEFAULT) or "energy" (in-program sort
    # by post-DC patch energy — trip-count-homogeneous blocks let the
    # kernel's per-block early exit pay).  Measured r4
    # (ab_denoise_order.json, outputs bitwise identical): energy is
    # +13.9% at 512^2 but -20% at 1024^2 — the full argsort over 1M
    # lanes is the known VPU anti-pattern (CLAUDE.md r4) and outgrows
    # the early-exit ceiling (~11%).  Opt in for <=512^2 images only.
    order: str = "raster"


@dataclass(frozen=True)
class WhitenConfig:
    eps: float = 1e-2
    pca_dim: int | None = None   # None = ZCA, int = PCA-whitening to that dim


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh config: 'data' shards the patch axis (the reference's
    joblib fan-out equivalent), 'model' optionally shards the atom axis."""

    data: int = -1               # -1 = all devices on the data axis
    model: int = 1


def from_yaml(path: str) -> dict[str, Any]:
    """Load an experiment config dict from YAML (or JSON fallback)."""
    text = open(path).read()
    try:
        import yaml  # type: ignore

        return yaml.safe_load(text)
    except ImportError:
        import json

        return json.loads(text)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
