"""Label-Consistent K-SVD (Jiang, Lin, Davis 2011; BASELINE config 5).

LC-KSVD2 objective: jointly learn dictionary D, code-transform A and linear
classifier W by running K-SVD on the stacked system

    X~ = [X; sqrt(alpha) Q; sqrt(beta) H],
    D~ = [D; sqrt(alpha) A; sqrt(beta) W]   (columns renormalized),

where Q (K x N) are label-consistent 'discriminative' ideal codes (atom
blocks assigned per class) and H (C x N) one-hot labels.  alpha=0 gives
LC-KSVD1 (no label-consistency term); beta=0 drops the classification term.

Initialization: per-class K-SVD dictionaries concatenated, codes from
Batch-OMP, A and W by ridge regression (oracle.lc_ksvd_* parity).
Prediction: gamma = OMP(D, x), argmax W gamma (SURVEY.md §3.4).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lyssandra_tpu.config import KSVDConfig, LCKSVDConfig
from lyssandra_tpu.classify.linear import one_hot, ridge
from lyssandra_tpu.dict_learning.ksvd import KSVDLearner
from lyssandra_tpu.ops.dictionaries import normalize_atoms
from lyssandra_tpu.solvers.encoder import SparseEncoder


def build_label_consistency(y, K: int, C: int) -> jax.Array:
    """Q (K, N): atom k 'belongs' to class c in contiguous blocks of K//C
    (remainder atoms to the last class) — oracle.build_label_consistency."""
    y = np.asarray(y, int)
    per = K // C
    lo = np.minimum(y * per, K)
    hi = np.where(y == C - 1, K, (y + 1) * per)
    ks = np.arange(K)[:, None]
    return jnp.asarray(((ks >= lo[None, :]) & (ks < hi[None, :])).astype(
        np.float32
    ))


class LCKSVD:
    """fit(X, y) -> self with D_, A_, W_; predict via argmax(W gamma)."""

    def __init__(self, cfg: LCKSVDConfig = LCKSVDConfig(), *,
                 predict_T: int | None = None):
        self.cfg = cfg
        self.predict_T = predict_T if predict_T is not None else cfg.T

    def fit(self, X, y) -> "LCKSVD":
        cfg = self.cfg
        X = jnp.asarray(X, jnp.float32)
        y = np.asarray(y, int)
        p, N = X.shape
        C = int(y.max()) + 1
        K = cfg.K
        self.C_ = C

        # --- init: per-class K-SVD dictionaries, ridge-initialized A, W
        per = K // C
        subdicts = []
        for c in range(C):
            Kc = per if c < C - 1 else K - per * (C - 1)
            Xc = X[:, y == c]
            sub = KSVDLearner(
                KSVDConfig(K=Kc, T=min(cfg.T, Kc), n_iter=max(2, cfg.n_iter // 2),
                           init="data", replace_dead=False, seed=cfg.seed + c)
            ).fit(Xc)
            subdicts.append(sub.D_)
        D0 = normalize_atoms(jnp.concatenate(subdicts, axis=1))

        enc = SparseEncoder("bomp", {"T": cfg.T}, check_atoms=False)
        G0 = enc.encode(X, D0)
        Q = build_label_consistency(y, K, C)
        H = one_hot(y, C)
        A0 = ridge(G0, Q)
        W0 = ridge(G0, H)

        # --- stack and run K-SVD on the joint system
        sa, sb = float(np.sqrt(cfg.alpha)), float(np.sqrt(cfg.beta))
        Xt = jnp.concatenate([X, sa * Q, sb * H], axis=0)
        Dt = jnp.concatenate([D0, sa * A0, sb * W0], axis=0)
        Dt = normalize_atoms(Dt)
        learner = KSVDLearner(
            KSVDConfig(K=K, T=cfg.T, n_iter=cfg.n_iter, replace_dead=False,
                       seed=cfg.seed),
        ).fit(Xt, D0=Dt)
        Dt = learner.D_
        self.history_ = learner.history_

        # --- unstack; renormalize so D has unit columns (A, W rescale with)
        D = Dt[:p]
        A = Dt[p : p + K] / sa if sa > 0 else jnp.zeros((K, K))
        W = Dt[p + K :] / sb if sb > 0 else jnp.zeros((C, K))
        nrm = jnp.maximum(jnp.linalg.norm(D, axis=0, keepdims=True), 1e-12)
        self.D_ = D / nrm
        self.A_ = A / nrm
        self.W_ = W / nrm
        return self

    def transform(self, X) -> jax.Array:
        """Sparse codes of X over the learned D (OMP, predict_T atoms)."""
        enc = SparseEncoder("omp", {"T": self.predict_T}, check_atoms=False)
        return enc.encode(jnp.asarray(X, jnp.float32), self.D_)

    def decision_function(self, X) -> jax.Array:
        return self.W_ @ self.transform(X)

    def predict(self, X) -> np.ndarray:
        return np.asarray(jnp.argmax(self.decision_function(X), axis=0))

    def score(self, X, y) -> float:
        return float((self.predict(X) == np.asarray(y)).mean())
