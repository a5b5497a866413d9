"""Where does the feature-extraction pipeline's time go? (VERDICT r3
task #8 — config-6 read 7.1 images/s on a chip that codes 8.8M
patches/s, and apps/features.py had never been profiled.)

Phases measured at the config-6 operating point (64×64 images, p=8
stride 4 -> 225 patches/image, K=256, T=10, dc+norm+whiten, levels
(1, 2)):

  1. block executable count + cold compile cost (the r3 suspect: the
     240/120-image transforms at img_block=64 compiled THREE distinct
     block shapes — 64, 48, 56 — two of them INSIDE the timed region,
     at 30-120 s each on the remote compile helper)
  2. warm per-block wall: extract+preprocess / encode / pool, timed
     separately (eager stage dispatches) and end-to-end
  3. end-to-end images/s on the config-6 total (360 images), warm

    python -m benchmarks.profile_features
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    import jax

    leaves = [t for t in jax.tree.leaves(x) if hasattr(t, "dtype")]
    return float(np.asarray(sum(jnp.sum(jnp.abs(t)) for t in leaves)))


def main():
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu import KSVDConfig, KSVDLearner
    from lyssandra_tpu.apps import FeatureExtractor
    from lyssandra_tpu.ops.patches import (
        contrast_normalize, extract_patches, n_patches, remove_dc,
    )
    from lyssandra_tpu.ops.whitening import Whitener
    from lyssandra_tpu.utils import patch_dataset, synthetic_image

    size, C = 64, 4
    kinds = ["smooth", "texture", "edges", "mix"]
    rng = np.random.default_rng(11)
    imgs = np.stack([
        synthetic_image(kinds[c], size, seed=1000 + c + 7 * i)
        + 4.0 * rng.standard_normal((size, size))
        for c in range(C) for i in range(90)
    ]).astype(np.float32)                      # 360 images, config-6 count

    Xp = patch_dataset(list(imgs[:32]), p=8, n_patches=20000,
                       seed=2).astype(np.float32)
    Xp, _ = remove_dc(jnp.asarray(Xp))
    Xp, _ = contrast_normalize(Xp)
    wh = Whitener().fit(Xp)
    learner = KSVDLearner(
        KSVDConfig(K=256, T=6, n_iter=4, init="data")
    ).fit(wh.transform(Xp))

    fe = FeatureExtractor(
        learner.D_, patch=8, stride=4, levels=(1, 2),
        preprocess="dc+norm+whiten", whitener=wh,
    )
    res = {"n_images": int(imgs.shape[0]), "img_block": fe.img_block,
           "patches_per_image": 225}

    # --- 1. cold: first full-block transform (compile) ---
    t0 = time.perf_counter()
    _sync(fe.transform(imgs[: fe.img_block]))
    res["cold_block_seconds"] = round(time.perf_counter() - t0, 2)

    # --- 2. warm per-stage wall on one full block ---
    block = jnp.asarray(imgs[: fe.img_block])
    p, s = fe.patch, fe.stride

    def stage_extract(ims):
        Xb = jax.vmap(lambda im: extract_patches(im, p, s))(ims)
        return fe._preprocess(
            jnp.moveaxis(Xb, 0, 1).reshape(p * p, -1))

    X = stage_extract(block)
    _sync(X)

    def timed(fn, *a):
        best = np.inf
        out = None
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*a)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return out, best

    X, t_ex = timed(stage_extract, block)
    codes, t_enc = timed(lambda X: fe.encoder.encode(X, fe.D), X)
    grid = n_patches(size, size, p, s)
    from lyssandra_tpu.apps.features import spatial_pyramid_pool

    K = codes.shape[0]
    Np = grid[0] * grid[1]

    def stage_pool(codes):
        per_img = jnp.moveaxis(codes.reshape(K, -1, Np), 1, 0)
        return jax.vmap(
            lambda c: spatial_pyramid_pool(c, grid, fe.levels))(per_img)

    _sync(stage_pool(codes))
    _, t_pool = timed(stage_pool, codes)
    _, t_block = timed(fe.transform, block)
    res["warm_block_seconds"] = {
        "extract+preprocess": round(t_ex, 4),
        "encode": round(t_enc, 4),
        "pool": round(t_pool, 4),
        "end_to_end": round(t_block, 4),
        "stage_sum": round(t_ex + t_enc + t_pool, 4),
    }
    print(json.dumps(res["warm_block_seconds"]), flush=True)

    # --- 3. end-to-end 360 images, warm ---
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        F = fe.transform(imgs)
        _sync(F)
        best = min(best, time.perf_counter() - t0)
    res["warm_360_seconds"] = round(best, 3)
    res["images_per_sec"] = round(imgs.shape[0] / best, 1)
    res["note"] = (
        "r3 config6 read 50.6 s for the same 360 images because the "
        "warm-up compiled a 4-image shape and the timed region then "
        "cold-compiled the 64-, 48- and 56-image block shapes; "
        "transform now pads partial blocks to img_block (ONE "
        "executable) and the config-6 warm-up uses a full block."
    )
    print(json.dumps({"images_per_sec": res["images_per_sec"],
                      "warm_360_seconds": res["warm_360_seconds"]}),
          flush=True)

    from benchmarks import write_result

    print("wrote", write_result("profile_features", res))


if __name__ == "__main__":
    main()
