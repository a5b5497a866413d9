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

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.config import KSVDConfig, LCKSVDConfig
from lyssandra_tpu.classify.linear import one_hot, ridge
from lyssandra_tpu.dict_learning.ksvd import KSVDLearner, ksvd_atom_update
from lyssandra_tpu.ops.dictionaries import init_dictionary, normalize_atoms
from lyssandra_tpu.solvers.encoder import SparseEncoder

_HI = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("T", "n_iter"))
def _ksvd_init_scan(Xs, D0s, *, T: int, n_iter: int):
    """All C per-class K-SVD init fits as ONE device program.

    Xs: (C, p, nmax) zero-padded class signals; D0s: (C, p, Kc).  vmap
    over classes x lax.scan over iterations.  The r1-r3 init ran C
    separate KSVDLearner fits — each class's signal count is distinct, so
    each fit COMPILED its own executables (30-120 s per shape over the
    remote-compile tunnel) and paid per-iteration host syncs; that, not
    compute, was the 283 s of config-5 LC-KSVD training.  Zero-padded
    columns code to zero (frozen lanes) and the atom-update masks exclude
    them, so padding changes nothing.
    """
    from lyssandra_tpu.solvers.greedy import _omp_impl

    def one_iter(Ds, _):
        def step(D, Xc):
            res = _omp_impl(D, Xc, 0.0, T=T, eps_mode=False, precision=_HI)
            Gamma = res.dense(D.shape[1])
            D2, _ = ksvd_atom_update(Xc, D, Gamma)
            return normalize_atoms(D2)

        return jax.vmap(step)(Ds, Xs), None

    Ds, _ = lax.scan(one_iter, D0s, None, length=n_iter)
    return Ds


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
        import time

        cfg = self.cfg
        # keep a host copy BEFORE device placement: the CPU-side init
        # below must not fetch X back from the device (the first
        # device->host fetch of a process stalls for minutes on the
        # tunneled backend — it dominated the r4 first-cut fit timing)
        Xnp = np.asarray(X, np.float32)
        X = jnp.asarray(X, jnp.float32)
        y = np.asarray(y, int)
        p, N = X.shape
        C = int(y.max()) + 1
        K = cfg.K
        self.C_ = C
        self.timings_ = {}
        t0 = time.perf_counter()

        # --- init: per-class K-SVD dictionaries, ridge-initialized A, W
        per = K // C
        init_iters = max(2, cfg.n_iter // 2)
        if K % C == 0:
            # equal per-class atom counts: run all C fits in one program
            # ON THE HOST CPU BACKEND — the init is tiny compute (~C x
            # (p, N/C) x K/C x 10 iters, milliseconds anywhere) but its
            # nested vmap/scan graph costs minutes on the REMOTE compile
            # helper; the local CPU backend compiles it in seconds and
            # fp32 CPU results are what the test suite pins anyway
            counts = np.bincount(y, minlength=C)
            nmax = int(counts.max())
            Xs = np.zeros((p, C, nmax), np.float32)
            for c in range(C):
                Xs[:, c, : counts[c]] = Xnp[:, y == c]
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                D0s = np.stack([
                    np.asarray(init_dictionary(
                        jnp.asarray(Xs[:, c, : counts[c]]), per, "data",
                        cfg.seed + c,
                    ))
                    for c in range(C)
                ])
                Ds = _ksvd_init_scan(
                    jnp.asarray(np.moveaxis(Xs, 1, 0)), jnp.asarray(D0s),
                    T=min(cfg.T, per), n_iter=init_iters,
                )
                Ds = np.asarray(Ds)
            D0 = jnp.asarray(np.moveaxis(Ds, 0, 1).reshape(p, K))
        else:
            subdicts = []
            for c in range(C):
                Kc = per if c < C - 1 else K - per * (C - 1)
                Xc = X[:, y == c]
                sub = KSVDLearner(
                    KSVDConfig(K=Kc, T=min(cfg.T, Kc), n_iter=init_iters,
                               init="data", replace_dead=False,
                               seed=cfg.seed + c)
                ).fit(Xc)
                subdicts.append(sub.D_)
            D0 = jnp.concatenate(subdicts, axis=1)
        D0 = normalize_atoms(D0)

        self.timings_["init_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        enc = SparseEncoder("bomp", {"T": cfg.T}, check_atoms=False)
        G0 = enc.encode(X, D0)
        Q = build_label_consistency(y, K, C)
        H = one_hot(y, C)
        A0 = ridge(G0, Q)
        W0 = ridge(G0, H)
        self.timings_["ridge_init_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()

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
        self.timings_["stacked_fit_s"] = time.perf_counter() - t0

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
