"""Workspace (checkpoint/resume), datasets, profiling utilities."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lyssandra_tpu.utils import (
    Workspace,
    patch_dataset,
    standard_test_image,
    synthetic_image,
    timed,
)


def test_workspace_arrays(tmp_path):
    ws = Workspace(str(tmp_path / "exp"))
    D = np.random.default_rng(0).standard_normal((8, 16))
    ws.save_array("D", D)
    np.testing.assert_array_equal(ws.load_array("D"), D)
    ws.save_array("multi", D=D, G=D * 2)
    out = ws.load_array("multi")
    np.testing.assert_array_equal(out["G"], D * 2)


def test_workspace_metrics_and_json(tmp_path):
    ws = Workspace(str(tmp_path / "exp"))
    ws.log_metrics({"iter": 0, "objective": 1.5})
    ws.log_metrics({"iter": 1, "objective": 1.2})
    m = ws.read_metrics()
    assert [x["iter"] for x in m] == [0, 1]
    ws.save_json("result", {"psnr": 30.4})
    assert ws.load_json("result")["psnr"] == 30.4


def test_workspace_checkpoint_resume(tmp_path):
    ws = Workspace(str(tmp_path / "exp"))
    state = {
        "D": jnp.ones((4, 8)),
        "A": jnp.zeros((8, 8)),
        "iter": jnp.asarray(3),
    }
    ws.save_state(3, state)
    step, restored = ws.load_latest_state(state)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["D"]), np.ones((4, 8)))
    # resume overwrite: later step wins
    ws.save_state(5, {**state, "iter": jnp.asarray(5)})
    step, restored = ws.load_latest_state(state)
    assert step == 5 and int(restored["iter"]) == 5


def test_synthetic_images():
    for kind in ("smooth", "texture", "edges", "mix"):
        img = synthetic_image(kind, size=64, seed=1)
        assert img.shape == (64, 64)
        assert 0 <= img.min() and img.max() <= 255.0
    # deterministic
    np.testing.assert_array_equal(
        synthetic_image("texture", 64, 2), synthetic_image("texture", 64, 2)
    )


def test_standard_test_image():
    b = standard_test_image("barbara", size=128)
    assert b.shape == (128, 128)
    l = standard_test_image("lena", size=128)
    assert not np.array_equal(b, l)


def test_patch_dataset():
    imgs = [synthetic_image("mix", 64, s) for s in range(2)]
    X = patch_dataset(imgs, p=8, n_patches=500, seed=0)
    assert X.shape == (64, 500)
    np.testing.assert_allclose(X.mean(axis=0), 0, atol=1e-9)


def test_timed_sync():
    f = lambda x: jnp.sin(x).sum()
    out, dt = timed(f, jnp.ones((128, 128)), reps=2)
    assert dt > 0


def test_synthetic_color_image_and_patches(rng):
    from lyssandra_tpu.ops import extract_patches
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    img = synthetic_color_image("texture", 48, seed=1)
    assert img.shape == (48, 48, 3)
    assert img.min() >= 0.0 and img.max() <= 255.0
    # deterministic across calls
    np.testing.assert_array_equal(
        img, synthetic_color_image("texture", 48, seed=1)
    )
    # channels correlated (shared luminance), not identical
    c = np.corrcoef(img[..., 0].ravel(), img[..., 1].ravel())[0, 1]
    assert 0.5 < c < 0.9999, c
    # patch_dataset layout matches extract_patches channel-major blocks
    X = patch_dataset([img], p=8, n_patches=50, seed=0, remove_dc=False)
    assert X.shape == (192, 50)
    Xall = np.asarray(extract_patches(jnp.asarray(img, jnp.float32), 8))
    # the sampled patch at (i, j) equals the extracted column at that pos
    r = np.random.default_rng(0)
    ii = r.integers(0, 41, 50 // 1 + 1)
    jj = r.integers(0, 41, 50 // 1 + 1)
    col = ii[0] * 41 + jj[0]
    np.testing.assert_allclose(X[:, 0], Xall[:, col], atol=1e-4)


def test_standard_test_image_color():
    from lyssandra_tpu.utils import standard_test_image

    img = standard_test_image("barbara", 64, color=True)
    assert img.shape == (64, 64, 3)
    gray = standard_test_image("barbara", 64)
    assert gray.shape == (64, 64)


def test_load_image_folders(tmp_path):
    # class-per-subdirectory layout (the reference's recognition datasets)
    import numpy as np
    from PIL import Image

    from lyssandra_tpu.utils import load_image_folders, synthetic_image

    for cls, kind in (("a_smooth", "smooth"), ("b_tex", "texture")):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            img = synthetic_image(kind, 32, seed=i)
            Image.fromarray(img.astype(np.uint8)).save(d / f"im{i}.png")
        np.save(d / "im2.npy", synthetic_image(kind, 32, seed=9))
    imgs, y, names = load_image_folders(str(tmp_path))
    assert names == ["a_smooth", "b_tex"]
    assert len(imgs) == 6 and list(y) == [0, 0, 0, 1, 1, 1]
    assert all(im.shape == (32, 32) for im in imgs)
    imgs16, _, _ = load_image_folders(str(tmp_path), size=16,
                                      extensions=(".png",))
    assert all(im.shape == (16, 16) for im in imgs16)
    # mismatched shapes without resize: clear error (ADVICE r1), unless
    # the caller opts into mixed sizes (patch-sampling consumers)
    Image.fromarray(
        synthetic_image("smooth", 48, seed=3).astype(np.uint8)
    ).save(tmp_path / "a_smooth" / "big.png")
    with pytest.raises(ValueError, match="mismatched"):
        load_image_folders(str(tmp_path))
    mixed, _, _ = load_image_folders(str(tmp_path), allow_mixed=True)
    assert len(mixed) == 7


def test_compile_cache_helper_and_cold_compile_warning(tmp_path):
    """VERDICT r4 #2: a fresh-shape user must never be silently stalled
    for ~31 min — either a persistent compilation cache is configured
    (enable_compile_cache) or the pallas cold start warns once, with
    both escape hatches named, before its first expensive compile."""
    import os
    import warnings

    import jax

    import importlib

    lasso = importlib.import_module("lyssandra_tpu.solvers.lasso")
    from lyssandra_tpu.utils.compile_cache import (
        cache_enabled, enable_compile_cache,
    )

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        assert not cache_enabled()
        lasso._pallas_cold_warned = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            lasso._warn_pallas_cold_compile(8)    # cheap depth: silent
            assert len(w) == 0
            lasso._warn_pallas_cold_compile(28)
            assert len(w) == 1
            msg = str(w[0].message)
            assert "enable_compile_cache" in msg
            assert "cold_backend='xla'" in msg
            lasso._warn_pallas_cold_compile(28)   # once per process
            assert len(w) == 1
        path = enable_compile_cache(str(tmp_path / "cache"))
        assert cache_enabled() and os.path.isdir(path)
        lasso._pallas_cold_warned = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            lasso._warn_pallas_cold_compile(28)   # cache on: no warning
            assert len(w) == 0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        lasso._pallas_cold_warned = False
