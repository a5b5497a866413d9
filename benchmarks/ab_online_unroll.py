"""In-scan coder cold_unroll A/B for online-DL (r8).

    python -m benchmarks.ab_online_unroll

The host-level feature_sign unroll default (28) does NOT carry into the
epoch scan automatically: in-scan economics have flipped two knobs
before (fs_warm_start, code_blocks), so the in-scan unroll gets its own
chip A/B at the config-4 operating point (50k color patches, K=1024,
bs=4096, cb=4 -> 1024-lane sub-blocks).  Writes
benchmarks/results/ab_online_unroll.json.
"""

import json
import time

import numpy as np

import jax.numpy as jnp


def main():
    from lyssandra_tpu import OnlineDLConfig
    from lyssandra_tpu.dict_learning import OnlineDictionaryLearner
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    n, K, bs = 51200, 1024, 4096
    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n, seed=1).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)

    res = {"shape": {"n": n, "K": K, "bs": bs, "lam": 0.15}}
    for cu in (0, 8, 16, 28):
        cfg = OnlineDLConfig(K=K, lam=0.15, batch_size=bs,
                             fs_cold_unroll=cu)
        learner = OnlineDictionaryLearner(cfg)
        # warm-up chunk compiles the epoch executable
        t0 = time.perf_counter()
        learner.fit(X[:, : bs * learner.cfg.chunk_batches])
        compile_s = time.perf_counter() - t0
        learner.state = None
        learner.history_ = []
        t0 = time.perf_counter()
        learner.fit(X, n_epochs=1)
        dt = time.perf_counter() - t0
        n_coded = (n // bs) * bs
        res[f"cu{cu}"] = {
            "seconds": round(dt, 2),
            "pps": round(n_coded / dt, 1),
            "compile_s": round(compile_s, 1),
            "final_obj": float(learner.history_[-1]["batch_objective"]),
        }
        print(json.dumps({f"cu{cu}": res[f"cu{cu}"]}), flush=True)

    from benchmarks import write_result

    print("wrote", write_result("ab_online_unroll", res))


if __name__ == "__main__":
    main()
