"""NumPy oracle: slow, obviously-correct reference implementations.

This module is the executable specification of the reference framework's
semantics (ektormak/Lyssandra).  The reference mount was empty at survey time
(see SURVEY.md provenance warning), so these implementations follow the
published algorithms the reference implements:

- OMP / Batch-OMP:  Rubinstein, Zibulevsky, Elad 2008, "Efficient
  Implementation of the K-SVD Algorithm using Batch Orthogonal Matching
  Pursuit" (Alg. 1 / Alg. 2).
- Feature-sign search:  Lee, Battle, Raina, Ng 2006, "Efficient sparse
  coding algorithms".
- K-SVD:  Aharon, Elad, Bruckstein 2006 (+ approximate K-SVD per
  Rubinstein et al. 2008).
- Online dictionary learning:  Mairal, Bach, Ponce, Sapiro 2009.
- LC-KSVD:  Jiang, Lin, Davis 2011.
- SRC:  Wright et al. 2009.
- Denoising:  Elad, Aharon 2006.

Everything is float64 NumPy, per-signal Python loops, no cleverness.  The
JAX/TPU implementations in the rest of the package are tested per-patch
against these functions (tests/), and bench.py measures these as the CPU
reference baseline (BASELINE.md: the reference publishes no numbers, so the
baseline is this oracle measured on the local CPU).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Patch pipeline (L2)
# ---------------------------------------------------------------------------


def extract_patches(img: np.ndarray, p: int, stride: int = 1) -> np.ndarray:
    """All p x p patches at the given stride, as columns of X in R^{p^2 x N}.

    Patches are taken row-major over valid top-left positions; each patch is
    flattened row-major (C order).  A color image (H, W, C) yields
    (C p^2, N) columns with channels stacked as leading row blocks.
    """
    if img.ndim == 3:
        return np.concatenate(
            [extract_patches(img[..., c], p, stride)
             for c in range(img.shape[2])],
            axis=0,
        )
    H, W = img.shape
    rows = range(0, H - p + 1, stride)
    cols = range(0, W - p + 1, stride)
    X = np.empty((p * p, len(rows) * len(cols)), dtype=np.float64)
    n = 0
    for i in rows:
        for j in cols:
            X[:, n] = img[i : i + p, j : j + p].reshape(-1)
            n += 1
    return X


def reconstruct_from_patches(
    X: np.ndarray, shape: tuple[int, int], p: int, stride: int = 1,
    y: np.ndarray | None = None, lam: float = 0.0,
) -> np.ndarray:
    """Overlap-add average of patches; inverse of :func:`extract_patches`.

    With ``y``/``lam`` given, computes the Elad-Aharon 2006 denoising blend
    ``(lam*I + sum R^T R)^{-1} (lam*y + sum R^T x_hat)`` — a per-pixel
    weighted average of the noisy image and the overlapping reconstructions.
    A 3-tuple shape (H, W, C) folds C channel row-blocks of X.
    """
    if len(shape) == 3:
        H, W, C = shape
        rows = X.shape[0] // C
        return np.stack(
            [
                reconstruct_from_patches(
                    X[c * rows : (c + 1) * rows], (H, W), p, stride,
                    y=None if y is None else y[..., c], lam=lam,
                )
                for c in range(C)
            ],
            axis=-1,
        )
    H, W = shape
    acc = np.zeros((H, W), dtype=np.float64)
    cnt = np.zeros((H, W), dtype=np.float64)
    n = 0
    for i in range(0, H - p + 1, stride):
        for j in range(0, W - p + 1, stride):
            acc[i : i + p, j : j + p] += X[:, n].reshape(p, p)
            cnt[i : i + p, j : j + p] += 1.0
            n += 1
    if y is not None:
        return (lam * y + acc) / (lam + cnt)
    return acc / np.maximum(cnt, 1.0)


def remove_dc(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Subtract per-column mean; return (centered X, means)."""
    means = X.mean(axis=0)
    return X - means[None, :], means


def contrast_normalize(
    X: np.ndarray, eps: float = 1e-8
) -> tuple[np.ndarray, np.ndarray]:
    """Divide each column by max(||x||_2, eps); return (X_n, scales)."""
    scales = np.maximum(np.linalg.norm(X, axis=0), eps)
    return X / scales[None, :], scales


class ZCAWhitener:
    """ZCA (or PCA) whitening: W = V (Lam + eps I)^{-1/2} V^T on centered data."""

    def __init__(self, eps: float = 1e-2, pca_dim: int | None = None):
        self.eps = eps
        self.pca_dim = pca_dim

    def fit(self, X: np.ndarray) -> "ZCAWhitener":
        self.mean_ = X.mean(axis=1, keepdims=True)
        Xc = X - self.mean_
        C = Xc @ Xc.T / Xc.shape[1]
        lam, V = np.linalg.eigh(C)
        lam = lam[::-1]
        V = V[:, ::-1]
        if self.pca_dim is not None:
            lam, V = lam[: self.pca_dim], V[:, : self.pca_dim]
        d = 1.0 / np.sqrt(lam + self.eps)
        if self.pca_dim is None:
            self.W_ = V @ np.diag(d) @ V.T          # ZCA
            self.Winv_ = V @ np.diag(1.0 / d) @ V.T
        else:
            self.W_ = np.diag(d) @ V.T              # PCA-whiten (dim-reducing)
            self.Winv_ = V @ np.diag(1.0 / d)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return self.W_ @ (X - self.mean_)

    def inverse_transform(self, Xw: np.ndarray) -> np.ndarray:
        return self.Winv_ @ Xw + self.mean_


# ---------------------------------------------------------------------------
# Dictionaries
# ---------------------------------------------------------------------------


def dct_dictionary(p: int, K: int) -> np.ndarray:
    """Overcomplete 2-D DCT dictionary, D in R^{p^2 x K}, unit columns.

    K must be a perfect square k^2; atoms are outer products of k 1-D DCT
    vectors of length p (the standard K-SVD overcomplete DCT construction).
    """
    k = int(round(np.sqrt(K)))
    assert k * k == K, "K must be a perfect square"
    V = np.zeros((p, k))
    for i in range(k):
        v = np.cos(np.arange(p) * i * np.pi / k)
        if i > 0:
            v -= v.mean()
        V[:, i] = v / np.linalg.norm(v)
    D = np.kron(V, V)  # (p^2, k^2), column (a,b) = outer(V[:,a], V[:,b]).ravel()
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    return D


def init_dictionary(
    X: np.ndarray, K: int, method: str = "data", seed: int = 0
) -> np.ndarray:
    """Unit-norm initial dictionary: random Gaussian, random data columns, or DCT."""
    rng = np.random.default_rng(seed)
    p = X.shape[0]
    if method == "random":
        D = rng.standard_normal((p, K))
    elif method == "data":
        cols = rng.choice(X.shape[1], size=K, replace=X.shape[1] < K)
        D = X[:, cols].copy()
        # avoid zero columns
        bad = np.linalg.norm(D, axis=0) < 1e-10
        D[:, bad] = rng.standard_normal((p, int(bad.sum())))
    elif method == "dct":
        return dct_dictionary(int(round(np.sqrt(p))), K)
    else:
        raise ValueError(method)
    return D / np.linalg.norm(D, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Greedy solvers (L3)
# ---------------------------------------------------------------------------


def omp(
    D: np.ndarray, X: np.ndarray, T: int, eps: float | None = None
) -> np.ndarray:
    """Orthogonal Matching Pursuit, per-signal (Rubinstein 2008 Alg. 1).

    Stops at ``|I| = T`` atoms or residual ``||r||_2 <= eps`` (if given).
    Returns dense code matrix Gamma in R^{K x N}.
    """
    K, N = D.shape[1], X.shape[1]
    Gamma = np.zeros((K, N))
    for n in range(N):
        x = X[:, n]
        r = x.copy()
        I: list[int] = []
        for _ in range(T):
            if eps is not None and np.linalg.norm(r) <= eps:
                break
            k = int(np.argmax(np.abs(D.T @ r)))
            if k in I:
                break
            I.append(k)
            g, *_ = np.linalg.lstsq(D[:, I], x, rcond=None)
            r = x - D[:, I] @ g
        if I:
            Gamma[I, n] = g
    return Gamma


def masked_omp(
    D: np.ndarray, X: np.ndarray, M: np.ndarray, T: int,
    eps: float | None = None,
) -> np.ndarray:
    """OMP over per-signal OBSERVED coordinates (the inpainting coder:
    Elad's sparse-representation inpainting — code M o x over the masked
    atoms M o d_k, selection normalized by the masked atom norms).

    M: (p, N) in {0, 1}.  Returns dense Gamma (K, N).
    """
    K, N = D.shape[1], X.shape[1]
    Gamma = np.zeros((K, N))
    for n in range(N):
        m = M[:, n].astype(bool)
        Dm = D[m]                         # (p_obs, K)
        nrm = np.linalg.norm(Dm, axis=0)
        ok = nrm > 1e-6
        x = X[m, n]
        r = x.copy()
        I: list[int] = []
        g = np.zeros(0)
        for _ in range(T):
            if eps is not None and np.linalg.norm(r) <= eps:
                break
            score = np.where(ok, np.abs(Dm.T @ r) / np.maximum(nrm, 1e-6),
                             -np.inf)
            k = int(np.argmax(score))
            if k in I:
                break
            I.append(k)
            g, *_ = np.linalg.lstsq(Dm[:, I], x, rcond=None)
            r = x - Dm[:, I] @ g
        if I:
            Gamma[I, n] = g
    return Gamma


def batch_omp(
    D: np.ndarray, X: np.ndarray, T: int, eps: float | None = None
) -> np.ndarray:
    """Batch-OMP with precomputed Gram and progressive Cholesky updates.

    Rubinstein/Zibulevsky/Elad 2008, Algorithm 2.  Precomputes G = D^T D and
    alpha0 = D^T X; never forms residuals.  In eps mode the residual norm is
    tracked through the delta recurrence
    ``||r||^2_t = ||r||^2_{t-1} - (delta_t - delta_{t-1})`` with
    ``delta_t = gamma_t^T alpha0_I``.
    """
    K, N = D.shape[1], X.shape[1]
    G = D.T @ D
    A0 = D.T @ X
    Gamma = np.zeros((K, N))
    for n in range(N):
        a0 = A0[:, n]
        a = a0.copy()
        err = float(X[:, n] @ X[:, n])
        delta = 0.0
        I: list[int] = []
        L = np.zeros((T, T))
        g = np.zeros(0)
        for t in range(T):
            if eps is not None and err <= eps * eps:
                break
            k = int(np.argmax(np.abs(a)))
            if k in I:
                break
            if t == 0:
                L[0, 0] = 1.0
            else:
                w = np.linalg.solve(L[:t, :t], G[I, k])
                d2 = 1.0 - w @ w
                if d2 <= 1e-12:
                    break  # atom nearly dependent on selection
                L[t, :t] = w
                L[t, t] = np.sqrt(d2)
            I.append(k)
            t1 = len(I)
            y = np.linalg.solve(L[:t1, :t1], a0[I])
            g = np.linalg.solve(L[:t1, :t1].T, y)
            a = a0 - G[:, I] @ g
            new_delta = g @ a0[I]
            err = err - (new_delta - delta)
            delta = new_delta
        if I:
            Gamma[I, n] = g
    return Gamma


def group_omp(
    D: np.ndarray, X: np.ndarray, groups: np.ndarray, T: int,
    eps: float | None = None,
) -> np.ndarray:
    """Group OMP: select argmax_g ||D_g^T r||_2, least-squares over the union.

    ``groups`` is an int array of length K assigning each atom to a group.
    Stops after T groups (or ||r|| <= eps).
    """
    K, N = D.shape[1], X.shape[1]
    Gamma = np.zeros((K, N))
    gids = np.unique(groups)
    members = {g: np.where(groups == g)[0] for g in gids}
    for n in range(N):
        x = X[:, n]
        r = x.copy()
        sel: list[int] = []
        atoms: list[int] = []
        for _ in range(T):
            if eps is not None and np.linalg.norm(r) <= eps:
                break
            c = D.T @ r
            scores = np.array([np.linalg.norm(c[members[g]]) for g in gids])
            scores[[int(np.where(gids == s)[0][0]) for s in sel]] = -np.inf
            gbest = int(gids[int(np.argmax(scores))])
            sel.append(gbest)
            atoms = sorted(set(atoms) | set(members[gbest].tolist()))
            g_ls, *_ = np.linalg.lstsq(D[:, atoms], x, rcond=None)
            r = x - D[:, atoms] @ g_ls
        if atoms:
            Gamma[atoms, n] = g_ls
    return Gamma


def nn_omp(D: np.ndarray, X: np.ndarray, T: int) -> np.ndarray:
    """Non-negative OMP: select argmax of positive correlations, NNLS solve."""
    from scipy.optimize import nnls

    K, N = D.shape[1], X.shape[1]
    Gamma = np.zeros((K, N))
    for n in range(N):
        x = X[:, n]
        r = x.copy()
        I: list[int] = []
        for _ in range(T):
            c = D.T @ r
            c[I] = -np.inf
            k = int(np.argmax(c))
            if c[k] <= 0:
                break
            I.append(k)
            g, _ = nnls(D[:, I], x)
            r = x - D[:, I] @ g
        if I:
            Gamma[I, n] = g
    return Gamma


def threshold_code(D: np.ndarray, X: np.ndarray, lam: float,
                   kind: str = "soft") -> np.ndarray:
    """One-shot thresholding coder: Gamma = shrink(D^T X, lam)."""
    A = D.T @ X
    if kind == "soft":
        return np.sign(A) * np.maximum(np.abs(A) - lam, 0.0)
    elif kind == "hard":
        return A * (np.abs(A) > lam)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Convex solvers (lasso)
# ---------------------------------------------------------------------------


def feature_sign(
    D: np.ndarray, x: np.ndarray, lam: float, max_iter: int = 1000
) -> np.ndarray:
    """Feature-sign search for min_g ||x - D g||^2 + lam ||g||_1.

    Lee, Battle, Raina, Ng (NIPS 2006), Algorithm "Feature-sign search".
    Note the objective uses ||.||^2 (not 1/2 ||.||^2): optimality conditions
    are  2 d_k^T (D g - x) + lam sign(g_k) = 0 for active k,
         |2 d_k^T (D g - x)| <= lam for inactive k.
    """
    K = D.shape[1]
    g = np.zeros(K)
    theta = np.zeros(K)           # sign vector
    active: list[int] = []
    DtD = D.T @ D
    Dtx = D.T @ x

    def grad(gv):
        return 2.0 * (DtD @ gv - Dtx)

    for _ in range(max_iter):
        gr = grad(g)
        # Step 2: activate the zero coefficient with largest |grad| > lam
        zero_mask = np.array([i not in active for i in range(K)])
        cand = np.where(zero_mask & (np.abs(gr) > lam + 1e-12))[0]
        if len(cand) > 0:
            i = int(cand[np.argmax(np.abs(gr[cand]))])
            theta[i] = -np.sign(gr[i])
            active.append(i)
        elif not active:
            break
        # Step 3: feature-sign step (loop until active-set optimality)
        for _ in range(max_iter):
            A = sorted(active)
            DA = D[:, A]
            th = theta[A]
            # analytic minimizer over active set with current signs
            gnew_A = np.linalg.solve(
                DA.T @ DA + 1e-12 * np.eye(len(A)), DA.T @ x - lam * th / 2.0
            )
            gold_A = g[A]
            # discrete line search over sign changes between gold and gnew
            ts = [1.0]
            for j in range(len(A)):
                denom = gnew_A[j] - gold_A[j]
                if abs(denom) > 1e-15:
                    t = -gold_A[j] / denom
                    if 0.0 < t < 1.0:
                        ts.append(t)

            def obj(gv):
                r = x - DA @ gv
                return r @ r + lam * np.abs(gv).sum()

            best_t, best_o = None, np.inf
            for t in ts:
                gv = gold_A + t * (gnew_A - gold_A)
                o = obj(gv)
                if o < best_o - 1e-15:
                    best_o, best_t = o, t
            gbest = gold_A + best_t * (gnew_A - gold_A)
            # remove zeroed coefficients
            g[A] = gbest
            for j, a in enumerate(A):
                if abs(gbest[j]) < 1e-12:
                    g[a] = 0.0
                    theta[a] = 0.0
                    if a in active:
                        active.remove(a)
                else:
                    theta[a] = np.sign(gbest[j])
            # check optimality of active (nonzero) coefficients
            gr = grad(g)
            if not active:
                break
            act = np.array(sorted(active))
            if np.all(np.abs(gr[act] + lam * theta[act]) < 1e-9):
                break
        # Step 4: check optimality of zero coefficients
        gr = grad(g)
        inact = np.array([i for i in range(K) if i not in active])
        if len(inact) == 0 or np.all(np.abs(gr[inact]) <= lam + 1e-9):
            break
    return g


def lasso(D: np.ndarray, X: np.ndarray, lam: float) -> np.ndarray:
    """Lasso codes for all columns via feature-sign search."""
    K, N = D.shape[1], X.shape[1]
    Gamma = np.zeros((K, N))
    for n in range(N):
        Gamma[:, n] = feature_sign(D, X[:, n], lam)
    return Gamma


# ---------------------------------------------------------------------------
# Dictionary learning (L4)
# ---------------------------------------------------------------------------


def ksvd_atom_update(
    X: np.ndarray, D: np.ndarray, Gamma: np.ndarray, exact: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """One Gauss-Seidel sweep of K-SVD atom updates (in atom order 0..K-1).

    exact=True: rank-1 SVD of the restricted error (Aharon et al. 2006).
    exact=False: single power-iteration step (approximate K-SVD,
    Rubinstein et al. 2008): d = E g / ||E g||; g = E^T d.
    Atom k+1 sees atom k's update (order matters: sequential semantics).
    """
    D = D.copy()
    Gamma = Gamma.copy()
    K = D.shape[1]
    for k in range(K):
        omega = np.where(np.abs(Gamma[k]) > 0)[0]
        if len(omega) == 0:
            continue
        E = (
            X[:, omega]
            - D @ Gamma[:, omega]
            + np.outer(D[:, k], Gamma[k, omega])
        )
        if exact:
            U, s, Vt = np.linalg.svd(E, full_matrices=False)
            D[:, k] = U[:, 0]
            Gamma[k, omega] = s[0] * Vt[0]
        else:
            g = Gamma[k, omega]
            d = E @ g
            nd = np.linalg.norm(d)
            if nd < 1e-12:
                continue
            d /= nd
            D[:, k] = d
            Gamma[k, omega] = E.T @ d
    return D, Gamma


def replace_unused_atoms(
    X: np.ndarray, D: np.ndarray, Gamma: np.ndarray,
    min_use: int = 1, max_coherence: float = 0.99, seed: int = 0,
) -> np.ndarray:
    """Replace dead (under-used) or mutually-coherent atoms with the
    worst-reconstructed signals, renormalized (standard K-SVD bookkeeping)."""
    D = D.copy()
    err = ((X - D @ Gamma) ** 2).sum(axis=0)
    order = np.argsort(-err)  # worst first
    use = (np.abs(Gamma) > 0).sum(axis=1)
    G = np.abs(D.T @ D)
    np.fill_diagonal(G, 0.0)
    nxt = 0
    for k in range(D.shape[1]):
        if use[k] < min_use or G[k].max() > max_coherence:
            d = X[:, order[nxt % len(order)]].copy()
            nxt += 1
            nrm = np.linalg.norm(d)
            if nrm < 1e-10:
                continue
            D[:, k] = d / nrm
            G = np.abs(D.T @ D)
            np.fill_diagonal(G, 0.0)
    return D


def ksvd(
    X: np.ndarray, K: int, T: int, n_iter: int = 10,
    init: str = "data", exact: bool = True, seed: int = 0,
    replace_dead: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Full K-SVD: alternate Batch-OMP coding and sequential atom updates."""
    D = init_dictionary(X, K, init, seed)
    Gamma = np.zeros((K, X.shape[1]))
    for _ in range(n_iter):
        Gamma = batch_omp(D, X, T)
        D, Gamma = ksvd_atom_update(X, D, Gamma, exact=exact)
        if replace_dead:
            D = replace_unused_atoms(X, D, Gamma, seed=seed)
    return D, Gamma


def online_dl_step(
    D: np.ndarray, A: np.ndarray, B: np.ndarray,
    Xb: np.ndarray, lam: float, beta: float = 1.0, n_sweeps: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One online dictionary-learning step (Mairal et al. 2009).

    Codes the minibatch with lasso (feature-sign), accumulates sufficient
    statistics  A <- beta A + Gamma Gamma^T,  B <- beta B + X Gamma^T,  then
    runs ``n_sweeps`` of sequential block-coordinate descent over atoms:
    d_k <- proj_{||.||<=1}( d_k + (b_k - D a_k) / A_kk ).
    """
    Gamma = lasso(D, Xb, lam)
    A = beta * A + Gamma @ Gamma.T
    B = beta * B + Xb @ Gamma.T
    D = D.copy()
    K = D.shape[1]
    for _ in range(n_sweeps):
        for k in range(K):
            akk = A[k, k]
            if akk < 1e-10:
                continue
            u = D[:, k] + (B[:, k] - D @ A[:, k]) / akk
            D[:, k] = u / max(1.0, np.linalg.norm(u))
    return D, A, B


# ---------------------------------------------------------------------------
# Discriminative dictionaries + classification (L5)
# ---------------------------------------------------------------------------


def lc_ksvd_stack(
    X: np.ndarray, y: np.ndarray, D0: np.ndarray, A0: np.ndarray,
    W0: np.ndarray, Q: np.ndarray, H: np.ndarray,
    alpha: float, beta: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Build the stacked LC-KSVD system (Jiang et al. 2011).

    X_tilde = [X; sqrt(alpha) Q; sqrt(beta) H],
    D_tilde = [D; sqrt(alpha) A; sqrt(beta) W], columns renormalized.
    Returns (X_tilde, D_tilde).
    """
    Xt = np.vstack([X, np.sqrt(alpha) * Q, np.sqrt(beta) * H])
    Dt = np.vstack([D0, np.sqrt(alpha) * A0, np.sqrt(beta) * W0])
    Dt = Dt / np.linalg.norm(Dt, axis=0, keepdims=True)
    return Xt, Dt


def lc_ksvd_unstack(
    Dt: np.ndarray, p: int, K: int, C: int, alpha: float, beta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split learned stacked dictionary back into (D, A, W), renormalized so
    that D has unit columns (A, W rescaled consistently)."""
    D = Dt[:p]
    A = Dt[p : p + K] / np.sqrt(alpha)
    W = Dt[p + K :] / np.sqrt(beta)
    nrm = np.linalg.norm(D, axis=0, keepdims=True)
    return D / nrm, A / nrm, W / nrm


def build_label_consistency(y: np.ndarray, K: int, C: int) -> np.ndarray:
    """Q in R^{K x N}: Q[k, n] = 1 iff atom k is 'assigned' to class of n.

    Atoms are partitioned into C contiguous blocks of K//C (remainder to the
    last class), the standard LC-KSVD setup.
    """
    N = len(y)
    Q = np.zeros((K, N))
    per = K // C
    for n in range(N):
        c = int(y[n])
        lo = c * per
        hi = (c + 1) * per if c < C - 1 else K
        Q[lo:hi, n] = 1.0
    return Q


def one_hot(y: np.ndarray, C: int) -> np.ndarray:
    H = np.zeros((C, len(y)))
    H[y.astype(int), np.arange(len(y))] = 1.0
    return H


def ridge(Z: np.ndarray, Y: np.ndarray, lam: float = 1.0) -> np.ndarray:
    """W = Y Z^T (Z Z^T + lam I)^{-1}: ridge regression from codes Z to targets Y."""
    K = Z.shape[0]
    return Y @ Z.T @ np.linalg.inv(Z @ Z.T + lam * np.eye(K))


def src_predict(
    D: np.ndarray, labels: np.ndarray, X: np.ndarray, T: int = 10,
) -> np.ndarray:
    """Sparse-representation classification (Wright et al. 2009).

    D's columns are training samples with class ``labels``; codes each test
    column with OMP and predicts the class with minimal class-restricted
    residual ||x - D delta_c(gamma)||.
    """
    Gamma = omp(D, X, T)
    classes = np.unique(labels)
    out = np.empty(X.shape[1], dtype=labels.dtype)
    for n in range(X.shape[1]):
        best, bc = np.inf, classes[0]
        for c in classes:
            m = labels == c
            r = X[:, n] - D[:, m] @ Gamma[m, n]
            e = r @ r
            if e < best:
                best, bc = e, c
        out[n] = bc
    return out


def llc(D: np.ndarray, X: np.ndarray, knn: int = 5,
        lam: float = 1e-4) -> np.ndarray:
    """Locality-constrained Linear Coding (Wang et al. 2010, Alg. 2).

    Per signal: k nearest atoms, shift-invariant regularized LS with the
    sum-to-one constraint solved analytically.  fp64 per-signal reference
    for solvers.llc.
    """
    p, K = D.shape
    N = X.shape[1]
    G = np.zeros((K, N))
    for n in range(N):
        x = X[:, n]
        d2 = ((D - x[:, None]) ** 2).sum(axis=0)
        idx = np.argsort(d2)[:knn]
        B = D[:, idx].T                       # (k, p)
        z = B - x[None, :]
        C = z @ z.T
        C = C + (lam * np.trace(C) + 1e-12) * np.eye(knn)
        c = np.linalg.solve(C, np.ones(knn))
        c = c / c.sum()
        G[idx, n] = c
    return G


# ---------------------------------------------------------------------------
# Applications (L6)
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(peak * peak / mse)


def denoise(
    noisy: np.ndarray, D: np.ndarray, sigma: float,
    p: int = 8, gain: float = 1.15, lam: float = 0.5, T_max: int = 32,
) -> np.ndarray:
    """Elad-Aharon 2006 patch denoising with error-constrained Batch-OMP.

    eps = gain * sqrt(dim) * sigma (residual norm target per patch;
    dim = p^2 grayscale, C p^2 color — a color image (H, W, C) is denoised
    by coding C p^2-dim color patches over a (C p^2, K) dictionary).
    """
    X = extract_patches(noisy, p)
    Xc, means = remove_dc(X)
    eps = gain * float(np.sqrt(X.shape[0])) * sigma
    Gamma = batch_omp(D, Xc, T_max, eps=eps)
    Xhat = D @ Gamma + means[None, :]
    lam_w = lam / max(sigma, 1e-12)
    return reconstruct_from_patches(Xhat, noisy.shape, p, y=noisy, lam=lam_w)
