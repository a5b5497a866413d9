"""Device-mesh parallelism: the rebuild of the reference's joblib fan-out.

SURVEY.md §2.2: the reference's only parallelism is process-level data
parallelism over signal chunks (joblib fork + memmap) plus BLAS threads.
The TPU-native equivalent is sharding the patch axis of X / Gamma over a
``('data',)`` mesh axis — the coding path is embarrassingly parallel, so the
hot loop has **zero** cross-chip traffic: `D` and its Gram are replicated,
each chip codes its shard of patches.

An optional ``'model'`` axis shards the atom axis (K) for very large
dictionaries — `G` (K x K), `alpha0` (N, K) and the codes are then
column-sharded and XLA inserts the argmax/psum collectives over ICI.

K-SVD's atom-update sweep contracts its sufficient statistics (X g,
Gamma g, X^T d, ...) over the sharded patch axis; under `jit` XLA inserts
the `psum` automatically — the explicit collectives the reference would
have needed NCCL for simply fall out of sharding propagation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lyssandra_tpu.dict_learning.ksvd import ksvd_atom_update
from lyssandra_tpu.solvers import greedy


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.  data=-1: all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def shard_patches(X: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard the patch (column) axis of X (p, N) over the 'data' axis."""
    return jax.device_put(X, NamedSharding(mesh, P(None, "data")))


def replicate(A: jax.Array, mesh: Mesh) -> jax.Array:
    """Replicate an array (e.g. the dictionary) on every device."""
    return jax.device_put(A, NamedSharding(mesh, P()))


@functools.partial(
    jax.jit, static_argnames=("T", "exact", "svd_iters")
)
def ksvd_train_step(X, D, T: int = 8, exact: bool = False,
                    svd_iters: int = 3):
    """One jittable K-SVD training step: Batch-OMP coding + sequential atom
    update.  This is the framework's 'full training step' — shard X over the
    data mesh and jit this to train data-parallel (SURVEY.md §3.2)."""
    Gamma = greedy.batch_omp(D, X, T, dense=True)
    D2, Gamma2 = ksvd_atom_update(X, D, Gamma, exact=exact,
                                  svd_iters=svd_iters)
    return D2, Gamma2


def sharded_ksvd_step(mesh: Mesh, T: int = 8, *, model_shard_atoms=False,
                      exact: bool = False, svd_iters: int = 3):
    """Compile a ksvd_train_step whose inputs/outputs are mesh-sharded.

    X: (p, N) sharded over 'data' on the patch axis.
    D: replicated (or atom-sharded over 'model' when model_shard_atoms —
    the Gram and codes then shard over the atom axis too).
    ``exact``/``svd_iters`` select the rank-1 SVD variant exactly as in
    ksvd_train_step.  Returns a function (X, D) -> (D', Gamma').
    """
    xs = NamedSharding(mesh, P(None, "data"))
    ds = (
        NamedSharding(mesh, P(None, "model"))
        if model_shard_atoms
        else NamedSharding(mesh, P())
    )
    gs = NamedSharding(
        mesh, P("model" if model_shard_atoms else None, "data")
    )

    @functools.partial(
        jax.jit,
        in_shardings=(xs, ds),
        out_shardings=(ds, gs),
    )
    def step(X, D):
        return ksvd_train_step(X, D, T, exact=exact, svd_iters=svd_iters)

    return step
