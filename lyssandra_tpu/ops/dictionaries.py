"""Dictionary construction and bookkeeping (atom-level utilities).

Matches :mod:`lyssandra_tpu.oracle` (`dct_dictionary`, `init_dictionary`,
`replace_unused_atoms`) semantics.  Construction is setup-time code (NumPy ok
per SURVEY §7 — only the solve/learn paths must be pure JAX); the bookkeeping
ops used inside learning loops (`normalize_atoms`, `replace_unused_atoms`)
are jitted.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def dct_dictionary(p: int, K: int, dtype=jnp.float32) -> jax.Array:
    """Overcomplete 2-D DCT dictionary (p^2, K), unit columns. K = k^2."""
    k = int(round(np.sqrt(K)))
    assert k * k == K, "K must be a perfect square"
    V = np.zeros((p, k))
    for i in range(k):
        v = np.cos(np.arange(p) * i * np.pi / k)
        if i > 0:
            v -= v.mean()
        V[:, i] = v / np.linalg.norm(v)
    D = np.kron(V, V)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    return jnp.asarray(D, dtype=dtype)


def dct_dictionary_color(
    p: int, K: int, channels: int = 3, dtype=jnp.float32
) -> jax.Array:
    """Channel-replicated DCT baseline for color patches: (C p^2, K).

    Each atom is the grayscale DCT atom stacked C times and renormalized
    (a 'grayscale' atom in color space — the standard fixed-dictionary
    baseline; learned color dictionaries come from init='data' K-SVD on
    (C p^2)-dim patches)."""
    D = dct_dictionary(p, K, dtype)
    return jnp.tile(D, (channels, 1)) / np.sqrt(channels)


def init_dictionary(
    X: jax.Array, K: int, method: str = "data", seed: int = 0,
    dtype=jnp.float32,
) -> jax.Array:
    """Unit-norm init: 'random' Gaussian, 'data' columns, or 'dct'."""
    if method == "dct":
        p2 = X.shape[0]
        q = int(round(np.sqrt(p2)))
        if q * q == p2:
            return dct_dictionary(q, K, dtype)
        # color patches: dim = C p^2 -> channel-replicated DCT baseline
        for C in (3, 4, 2):
            q = int(round(np.sqrt(p2 / C)))
            if C * q * q == p2:
                return dct_dictionary_color(q, K, C, dtype)
        raise ValueError(f"signal dim {p2} is not p^2 or C*p^2")
    key = jax.random.PRNGKey(seed)
    p, N = X.shape
    if method == "random":
        D = jax.random.normal(key, (p, K), dtype)
    elif method == "data":
        cols = jax.random.choice(key, N, (K,), replace=N < K)
        D = X[:, cols].astype(dtype)
        nrm = jnp.linalg.norm(D, axis=0)
        noise = jax.random.normal(jax.random.fold_in(key, 1), (p, K), dtype)
        D = jnp.where(nrm[None, :] < 1e-10, noise, D)
    else:
        raise ValueError(method)
    return normalize_atoms(D)


@jax.jit
def normalize_atoms(D: jax.Array) -> jax.Array:
    """Scale every column to unit l2 norm."""
    return D / jnp.maximum(jnp.linalg.norm(D, axis=0, keepdims=True), 1e-12)


@jax.jit
def mutual_coherence(D: jax.Array) -> jax.Array:
    """max_{i != j} |d_i . d_j| for a unit-norm dictionary."""
    G = jnp.abs(D.T @ D)
    G = G - jnp.diag(jnp.diag(G))
    return G.max()


def replace_unused_atoms(
    X: jax.Array, D: jax.Array, Gamma: jax.Array,
    min_use: int = 1, max_coherence: float = 0.99,
    *, return_mask: bool = False,
):
    """Replace dead (< min_use users) or overly-coherent atoms with the
    worst-reconstructed signals, renormalized.

    Semantics follow oracle.replace_unused_atoms: bad atoms (in index order)
    take successive signals from the worst-reconstruction ranking.  The
    coherence flag uses the UPPER triangle only (atom k is bad if it is
    >max_coherence-coherent with some LATER atom): the oracle's sequential
    loop replaces the first-visited member of a coherent pair and then
    re-evaluates, so the later member is kept — the one-pass both-members
    flag the r1-r3 code used caused permanent replacement churn on data
    with duplicated patches (each iteration re-inserts duplicate worst
    signals, flags both, replaces both, forever — caught at the N=1e6
    scale, r4).
    """
    err = ((X - D @ Gamma) ** 2).sum(axis=0)
    # only the K worst signals can be consumed (rank < K below): top_k
    # avoids a full argsort over N, slow on the TPU's vector unit
    _, order = jax.lax.top_k(err, min(D.shape[1], err.shape[0]))
    use = (jnp.abs(Gamma) > 0).sum(axis=1)
    K = D.shape[1]
    G = jnp.abs(D.T @ D) * jnp.triu(jnp.ones((K, K), D.dtype), k=1)
    bad = (use < min_use) | (G.max(axis=1) > max_coherence)
    # bad atom ranked r (in atom-index order) takes worst signal r
    rank = jnp.cumsum(bad) - 1
    src = order[rank % order.shape[0]]
    repl = X[:, src]
    repl = repl / jnp.maximum(jnp.linalg.norm(repl, axis=0, keepdims=True), 1e-10)
    D_out = jnp.where(bad[None, :], repl, D)
    return (D_out, bad) if return_mask else D_out
