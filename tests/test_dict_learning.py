"""K-SVD + online dictionary learning vs oracle (SURVEY.md §4.3-4.5)."""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from lyssandra_tpu.config import KSVDConfig, OnlineDLConfig
from lyssandra_tpu.dict_learning import (
    KSVDLearner,
    OnlineDictionaryLearner,
    ksvd_atom_update,
    online_dl_step,
)
from lyssandra_tpu.dict_learning.online import OnlineDLState
from tests.conftest import make_problem
import jax.numpy as jnp


def test_atom_update_matches_oracle_approx(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=120, T=3)
    Gamma = oracle.batch_omp(D, X, 3)
    Dr, Gr = oracle.ksvd_atom_update(X, D, Gamma, exact=False)
    Dj, Gj = ksvd_atom_update(
        jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.asarray(Gamma, jnp.float32), exact=False,
    )
    np.testing.assert_allclose(np.asarray(Dj), Dr, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Gj), Gr, atol=2e-3)


def test_atom_update_exact_decreases_objective(rng):
    # power-iterated 'exact' mode: matches the oracle's SVD solution in
    # objective (signs of singular vectors may flip)
    D, X, _ = make_problem(rng, p=16, K=24, N=120, T=3)
    Gamma = oracle.batch_omp(D, X, 3)
    err0 = np.linalg.norm(X - D @ Gamma) ** 2
    Dr, Gr = oracle.ksvd_atom_update(X, D, Gamma, exact=True)
    err_ref = np.linalg.norm(X - Dr @ Gr) ** 2
    Dj, Gj = ksvd_atom_update(
        jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.asarray(Gamma, jnp.float32), exact=True, svd_iters=5,
    )
    err_jax = float(
        np.linalg.norm(X - np.asarray(Dj, np.float64)
                       @ np.asarray(Gj, np.float64)) ** 2
    )
    assert err_jax <= err0 + 1e-6
    np.testing.assert_allclose(err_jax, err_ref, rtol=1e-3)


def test_atom_update_preserves_support(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=80, T=3)
    Gamma = oracle.batch_omp(D, X, 3)
    Dj, Gj = ksvd_atom_update(
        jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.asarray(Gamma, jnp.float32),
    )
    # K-SVD only changes coefficients on each atom's existing support
    assert (np.asarray(Gj)[Gamma == 0] == 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(Dj), axis=0), 1.0, atol=1e-4
    )


def test_atom_update_block_b1_matches_sequential_oracle(rng):
    # the residual-form sweep at atom_block=1 is mathematically the same
    # Gauss-Seidel recursion as the oracle (different fp expression only)
    D, X, _ = make_problem(rng, p=16, K=24, N=120, T=3)
    Gamma = oracle.batch_omp(D, X, 3)
    Dr, Gr = oracle.ksvd_atom_update(X, D, Gamma, exact=False)
    Dj, Gj = ksvd_atom_update(
        jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.asarray(Gamma, jnp.float32), exact=False, atom_block=1,
    )
    np.testing.assert_allclose(np.asarray(Dj), Dr, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Gj), Gr, atol=2e-3)


def test_atom_update_block_decreases_objective(rng):
    # Jacobi-within-block: not bitwise Gauss-Seidel, but each sweep must
    # still descend the objective and preserve supports/norms
    D, X, _ = make_problem(rng, p=16, K=32, N=400, T=4)
    Gamma = oracle.batch_omp(D, X, 4)
    err0 = np.linalg.norm(X - D @ Gamma) ** 2
    for B in (4, 8, 16):
        Dj, Gj = ksvd_atom_update(
            jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
            jnp.asarray(Gamma, jnp.float32), atom_block=B,
        )
        err = float(np.linalg.norm(
            X - np.asarray(Dj, np.float64) @ np.asarray(Gj, np.float64)
        ) ** 2)
        assert err < err0, (B, err, err0)
        assert (np.asarray(Gj)[Gamma == 0] == 0).all()
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(Dj), axis=0), 1.0, atol=1e-4
        )


def test_atom_update_block_close_to_sequential(rng):
    # iteration-level tolerance (SURVEY.md §3.2): the block sweep's
    # objective lands within a small relative margin of sequential's
    D, X, _ = make_problem(rng, p=16, K=32, N=400, T=4)
    Gamma = oracle.batch_omp(D, X, 4)

    def sweep_err(B):
        Dj, Gj = ksvd_atom_update(
            jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
            jnp.asarray(Gamma, jnp.float32), atom_block=B,
        )
        return float(np.linalg.norm(
            X - np.asarray(Dj, np.float64) @ np.asarray(Gj, np.float64)
        ) ** 2)

    seq = sweep_err(1)
    blk = sweep_err(8)
    assert abs(blk - seq) < 0.05 * seq, (blk, seq)


def test_ksvd_learner_block_converges_like_sequential(rng):
    # full fits: block-sweep learner reaches the sequential learner's
    # objective within 2% after the same number of iterations
    D, X, _ = make_problem(rng, p=16, K=24, N=300, T=3)
    Xf = np.asarray(X, np.float32)
    base = KSVDConfig(K=24, T=3, n_iter=5, replace_dead=False, seed=0)
    a = KSVDLearner(base).fit(Xf)
    import dataclasses

    b = KSVDLearner(dataclasses.replace(base, atom_block=8)).fit(Xf)
    oa = a.history_[-1]["objective"]
    ob = b.history_[-1]["objective"]
    assert ob < oa * 1.02, (ob, oa)
    # and each history is (near-)monotone
    objs = [h["objective"] for h in b.history_]
    assert all(objs[i + 1] <= objs[i] * 1.01 for i in range(len(objs) - 1))


def test_atom_update_compact_matches_dense_block(rng):
    # the compact sweep is the dense block sweep with Gamma's block rows
    # materialized from triplets — same math, near-identical results
    from lyssandra_tpu.dict_learning import ksvd_atom_update_compact
    from lyssandra_tpu.solvers import batch_omp

    D, X, _ = make_problem(rng, p=16, K=24, N=200, T=4, dtype=np.float32)
    Dj, Xj = jnp.asarray(D), jnp.asarray(X)
    res = batch_omp(Dj, Xj, 4, dense=False)
    Gamma = res.dense(24)
    Dd, Gd = ksvd_atom_update(Xj, Dj, Gamma, atom_block=8)
    Dc, gc, nusers = ksvd_atom_update_compact(
        Xj, Dj, res.idx, res.gamma, atom_block=8
    )
    np.testing.assert_allclose(np.asarray(Dc), np.asarray(Dd), atol=2e-5)
    # per-atom user counts match the dense support
    np.testing.assert_array_equal(
        np.asarray(nusers), (np.abs(np.asarray(Gamma)) > 0).sum(axis=1)
    )
    # reassemble dense from the updated compact codes
    from lyssandra_tpu.solvers.greedy import GreedyResult

    Gc = GreedyResult(res.idx, gc, res.err, res.nsel).dense(24)
    np.testing.assert_allclose(np.asarray(Gc), np.asarray(Gd), atol=2e-4)


def test_ksvd_learner_compact_codes(rng):
    # compact-codes fit: no dense Gamma anywhere, same convergence
    import dataclasses

    D, X, _ = make_problem(rng, p=16, K=24, N=300, T=3)
    Xf = np.asarray(X, np.float32)
    dense_cfg = KSVDConfig(K=24, T=3, n_iter=4, replace_dead=True,
                           atom_block=8, seed=0, codes="dense")
    a = KSVDLearner(dense_cfg).fit(Xf)
    b = KSVDLearner(
        dataclasses.replace(dense_cfg, codes="compact")
    ).fit(Xf)
    from lyssandra_tpu.solvers.greedy import GreedyResult

    assert isinstance(b.Gamma_, GreedyResult)
    oa = a.history_[-1]["objective"]
    ob = b.history_[-1]["objective"]
    assert abs(ob - oa) < 0.05 * oa, (ob, oa)
    # CSC export round-trips against the dense scatter
    csc = b.Gamma_.to_csc(24)
    np.testing.assert_allclose(
        csc.toarray(), np.asarray(b.Gamma_.dense(24)), atol=1e-6
    )


def test_ksvd_learner_objective_decreases(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=300, T=3)
    cfg = KSVDConfig(K=24, T=3, n_iter=5, init="data", exact_svd=False,
                     replace_dead=False, seed=0)
    learner = KSVDLearner(cfg).fit(np.asarray(X, np.float32))
    objs = [h["objective"] for h in learner.history_]
    assert objs[-1] < objs[0]
    assert learner.D_.shape == (16, 24)
    # final dictionary reconstructs better than the initial data columns
    assert learner.history_[-1]["rmse"] < 0.5


@pytest.mark.slow
def test_ksvd_objective_monotone_at_scale(rng):
    # VERDICT r1 weak #2 / r2 task #5: the config-2 trace ticked up +0.08%
    # on the final iteration.  Root cause (NOTES_r8.md): the CODING step
    # carries no monotonicity guarantee — greedy OMP re-codes from scratch
    # and can lose to the previous iteration's sweep-refined codes (the
    # fp64 oracle rises too, +1.8% on synthetic patches).  The invariant
    # that IS guaranteed — and what this test pins at 0.1% slack instead
    # of the old 1% whole-iteration fudge — is the within-iteration sweep
    # phase: objective (post-sweep) <= objective_coding (post-coding).
    # Run at a replacement-active scale: real image patches, K=256, many
    # dead/coherent atoms in early iters.
    from lyssandra_tpu.utils import patch_dataset, standard_test_image

    imgs = [standard_test_image("barbara", 256),
            standard_test_image("lena", 256)]
    X = patch_dataset(imgs, p=8, n_patches=10000).astype(np.float32)
    learner = KSVDLearner(KSVDConfig(K=256, T=8, n_iter=6)).fit(X)
    objs = [h["objective"] for h in learner.history_]
    for h in learner.history_:
        # exact sweep-phase monotonicity, 0.1% fp32 slack
        assert h["objective"] <= h["objective_coding"] * 1.001, h
    # cross-iteration rises are bounded by the greedy-coding loss, never
    # the old replacement-churn signature (r4: objective kept climbing)
    assert all(
        objs[i + 1] <= objs[i] * 1.03 for i in range(len(objs) - 1)
    ), objs
    assert objs[-1] < objs[0] * 0.5          # net progress
    assert learner.history_[0]["atoms_replaced"] > 0  # policy exercised


def test_ksvd_dead_atom_replacement(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=300, T=3)
    cfg = KSVDConfig(K=24, T=3, n_iter=3, replace_dead=True, seed=0)
    learner = KSVDLearner(cfg).fit(np.asarray(X, np.float32))
    assert all("atoms_replaced" in h for h in learner.history_)


def test_replace_coherent_keeps_one_of_pair(rng):
    # oracle semantics: the sequential loop replaces the lower-indexed
    # member of a coherent pair and keeps the other (re-evaluation after
    # each replacement); the vectorized one-pass must match via the
    # upper-triangle flag — flagging BOTH caused permanent replacement
    # churn on duplicated data (r4, N=1e6)
    from lyssandra_tpu import oracle
    from lyssandra_tpu.ops.dictionaries import replace_unused_atoms

    D, X, _ = make_problem(rng, p=16, K=24, N=200, T=3)
    D[:, 7] = D[:, 3]                  # coherent pair (3, 7)
    D[:, 15] = -D[:, 12]               # anti-coherent pair (12, 15)
    Gamma = oracle.batch_omp(D, X, 3)
    # min_use=0 isolates the coherence rule (exact-duplicate atoms are
    # never selected by OMP, so the dead rule would flag them all anyway)
    Dr = oracle.replace_unused_atoms(X, D, Gamma, min_use=0)
    Dj, bad = replace_unused_atoms(
        jnp.asarray(X, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.asarray(Gamma, jnp.float32), min_use=0, return_mask=True,
    )
    bad = np.asarray(bad)
    ref_replaced = np.abs(Dr - D).max(axis=0) > 1e-9
    np.testing.assert_array_equal(bad, ref_replaced)
    assert bad[3] and not bad[7]
    assert bad[12] and not bad[15]


def test_replacement_settles_on_duplicated_data(rng):
    # duplicated training patches (every signal sampled twice) must not
    # keep the replacement policy churning forever
    import dataclasses

    D, X, _ = make_problem(rng, p=16, K=32, N=150, T=3)
    Xdup = np.concatenate([X, X], axis=1).astype(np.float32)
    cfg = KSVDConfig(K=32, T=3, n_iter=6, replace_dead=True, seed=0)
    l = KSVDLearner(cfg).fit(Xdup)
    reps = [h["atoms_replaced"] for h in l.history_]
    objs = [h["objective"] for h in l.history_]
    assert reps[-1] <= max(2, reps[0] // 4), reps
    assert all(objs[i + 1] <= objs[i] * 1.01 for i in range(len(objs) - 1))


def test_online_dl_step_matches_oracle(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=100, T=3)
    lam = 0.15
    A = np.zeros((24, 24))
    B = np.zeros((16, 24))
    Dr, Ar, Br = oracle.online_dl_step(D, A, B, X, lam, n_sweeps=1)
    st = OnlineDLState(
        jnp.asarray(D, jnp.float32), jnp.asarray(A, jnp.float32),
        jnp.asarray(B, jnp.float32), jnp.zeros((), jnp.int32),
    )
    cfg = OnlineDLConfig(K=24, lam=lam, n_sweeps=1)
    st2, Gamma = online_dl_step(st, jnp.asarray(X, jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(st2.D), Dr, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st2.A), Ar, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st2.B), Br, atol=5e-3)


@pytest.mark.slow
def test_online_learner_objective_trend(rng):
    from lyssandra_tpu.solvers.lasso import feature_sign

    D, X, _ = make_problem(rng, p=16, K=24, N=512, T=3)
    lam = 0.15
    Xeval = np.asarray(X[:, :128], np.float32)

    def eval_obj(Dd):
        G = np.asarray(feature_sign(Dd, Xeval, lam)).astype(np.float64)
        R = Xeval - np.asarray(Dd, np.float64) @ G
        return (R * R).sum() + lam * np.abs(G).sum()

    cfg = OnlineDLConfig(K=24, lam=lam, batch_size=128, seed=0)
    learner = OnlineDictionaryLearner(cfg)
    learner.partial_fit(Xeval)  # init
    obj0 = eval_obj(learner.D_)
    learner.fit(np.asarray(X, np.float32), n_epochs=2)
    obj1 = eval_obj(learner.D_)
    # held-out objective on a fixed set improves with training
    assert obj1 < obj0
    nrm = np.linalg.norm(np.asarray(learner.D_), axis=0)
    assert (nrm <= 1.0 + 1e-5).all()


@pytest.mark.slow
def test_online_chunked_fit_matches_partial_fit(rng):
    # fit() scans minibatches on-device; semantics must match the
    # minibatch-at-a-time partial_fit path on the same data order
    D, X, _ = make_problem(rng, p=16, K=24, N=256, T=3)
    Xf = np.asarray(X, np.float32)
    cfg = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                         seed=0)
    a = OnlineDictionaryLearner(cfg).fit(Xf, seed=3)
    b = OnlineDictionaryLearner(cfg)
    perm = np.random.default_rng(3).permutation(256)
    for s in range(0, 256, 64):
        b.partial_fit(Xf[:, perm[s : s + 64]])
    np.testing.assert_allclose(
        np.asarray(a.D_), np.asarray(b.D_), atol=2e-3
    )


def test_online_code_blocks_matches_unblocked(rng):
    # code_blocks=cb codes each minibatch as cb sequential sub-blocks
    # (straggler isolation, ab_fs_block.json); lanes are independent, so
    # the learned dictionary must match the unblocked fit to fp noise
    D, X, _ = make_problem(rng, p=16, K=24, N=256, T=3)
    Xf = np.asarray(X, np.float32)
    cfg1 = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                          seed=0, code_blocks=1)
    cfg2 = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                          seed=0, code_blocks=2)
    a = OnlineDictionaryLearner(cfg1).fit(Xf, seed=3)
    b = OnlineDictionaryLearner(cfg2).fit(Xf, seed=3)
    np.testing.assert_allclose(
        np.asarray(a.D_), np.asarray(b.D_), atol=2e-3
    )


def test_online_fit_sharded_matches_single(rng):
    import jax
    from lyssandra_tpu.parallel import make_mesh

    D, X, _ = make_problem(rng, p=16, K=24, N=256, T=3)
    Xf = np.asarray(X, np.float32)
    cfg = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                         seed=0)
    a = OnlineDictionaryLearner(cfg).fit(Xf, seed=0)
    mesh = make_mesh(data=jax.device_count())
    b = OnlineDictionaryLearner(cfg, mesh=mesh).fit(Xf, seed=0)
    np.testing.assert_allclose(
        np.asarray(a.D_), np.asarray(b.D_), atol=2e-3
    )


def test_online_fit_holdout_objective_decreases(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=512, T=3)
    Xf = np.asarray(X, np.float32)
    cfg = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                         seed=0)
    learner = OnlineDictionaryLearner(cfg).fit(
        Xf[:, :448], n_epochs=2, holdout=Xf[:, 448:]
    )
    trace = [h["holdout_objective"] for h in learner.history_]
    assert trace[-1] < trace[0]


def test_online_dl_kill_and_resume(rng, tmp_path):
    # VERDICT r1 #7: a preempted online-DL fit resumes mid-stream and the
    # holdout trace continues identically to an uninterrupted run
    from lyssandra_tpu.utils import Workspace
    import lyssandra_tpu.dict_learning.online as online_mod

    D, X, _ = make_problem(rng, p=16, K=24, N=384, T=3)
    Xf = np.asarray(X, np.float32)
    hold = Xf[:, :64]
    cfg = OnlineDLConfig(K=24, lam=0.15, batch_size=64, chunk_batches=2,
                         seed=0)

    a = OnlineDictionaryLearner(cfg).fit(Xf, n_epochs=2, seed=5,
                                         holdout=hold)
    trace_a = [h["holdout_objective"] for h in a.history_]

    # interrupted run: the chunk executor raises after 3 chunks (a kill)
    ws = Workspace(str(tmp_path / "odl"))
    b = OnlineDictionaryLearner(cfg)
    real_chunk = online_mod._online_chunk
    calls = {"n": 0}

    def dying_chunk(*args, **kw):
        if calls["n"] >= 3:
            raise KeyboardInterrupt("simulated preemption")
        calls["n"] += 1
        return real_chunk(*args, **kw)

    online_mod._online_chunk = dying_chunk
    try:
        with pytest.raises(KeyboardInterrupt):
            b.fit(Xf, n_epochs=2, seed=5, holdout=hold, workspace=ws)
    finally:
        online_mod._online_chunk = real_chunk

    # fresh learner resumes from the checkpoint and finishes the stream
    c = OnlineDictionaryLearner(cfg)
    c.fit(Xf, n_epochs=2, seed=5, holdout=hold, workspace=ws,
          resume=True)
    trace_bc = (
        [h["holdout_objective"] for h in b.history_]
        + [h["holdout_objective"] for h in c.history_]
    )
    assert len(trace_bc) == len(trace_a)
    np.testing.assert_allclose(trace_bc, trace_a, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(c.D_), np.asarray(a.D_), atol=2e-4
    )


def test_ksvd_checkpoint_resume(rng, tmp_path):
    from lyssandra_tpu.utils import Workspace

    D, X, _ = make_problem(rng, p=16, K=24, N=200, T=3)
    Xf = np.asarray(X, np.float32)
    cfg = KSVDConfig(K=24, T=3, n_iter=4, replace_dead=False, seed=0)

    ws = Workspace(str(tmp_path / "run"))
    a = KSVDLearner(cfg, workspace=ws, checkpoint_every=2).fit(Xf)
    # a fresh learner resumes from the last checkpoint and skips finished
    # iterations
    b = KSVDLearner(cfg, workspace=ws, checkpoint_every=2)
    b.fit(Xf, resume=True)
    assert len(b.history_) == 0  # nothing left to do
    np.testing.assert_allclose(np.asarray(b.D_), np.asarray(a.D_), atol=1e-6)
    # partial resume: new workspace checkpointed at iter 1, resume runs 2..3
    ws2 = Workspace(str(tmp_path / "run2"))
    c = KSVDLearner(cfg, workspace=ws2, checkpoint_every=2)
    c.fit(Xf, n_iter=2)
    d = KSVDLearner(cfg, workspace=ws2, checkpoint_every=2)
    d.fit(Xf, resume=True)
    assert [h["iter"] for h in d.history_] == [2, 3]
