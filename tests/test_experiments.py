"""YAML-driven experiment runner (SURVEY.md §5 config + workspace flow)."""

import json
import os

import numpy as np

from lyssandra_tpu.experiments import run_experiment


def test_ksvd_experiment_from_yaml(tmp_path):
    spec = {
        "task": "ksvd",
        "workspace": str(tmp_path / "ws"),
        "data": {"images": ["barbara"], "size": 64, "n_patches": 512,
                 "patch": 8},
        "params": {"K": 32, "T": 3, "n_iter": 2},
    }
    path = tmp_path / "exp.json"
    path.write_text(json.dumps(spec))
    result = run_experiment(str(path))
    assert result["task"] == "ksvd"
    objs = result["objective_trace"]
    assert objs[-1] <= objs[0]
    # artifacts landed in the workspace
    assert os.path.exists(tmp_path / "ws" / "D.npz")
    assert os.path.exists(tmp_path / "ws" / "result.json")
    with np.load(tmp_path / "ws" / "D.npz") as z:
        assert z["D"].shape == (64, 32)


def test_encode_experiment(tmp_path):
    result = run_experiment({
        "task": "encode",
        "data": {"images": ["lena"], "size": 64, "n_patches": 256,
                 "patch": 8, "K": 64},
        "params": {"algorithm": "bomp", "T": 4},
    })
    assert result["avg_nnz"] <= 4.0 + 1e-6
    assert 0.0 < result["rel_err"] < 1.0


def test_denoise_experiment(tmp_path):
    result = run_experiment({
        "task": "denoise",
        "data": {"images": ["barbara"], "size": 64, "K": 64, "seed": 7},
        "params": {"sigma": 25.0, "T_max": 8, "block": 4096},
    })
    assert result["psnr"] > result["psnr_noisy"]


def test_color_denoise_and_ksvd_experiments(tmp_path):
    # data.color=true drives the RGB patch path from the YAML runner
    result = run_experiment({
        "task": "denoise",
        "data": {"images": ["barbara"], "size": 48, "K": 64, "seed": 7,
                 "color": True},
        "params": {"sigma": 25.0, "T_max": 8, "block": 4096},
    })
    assert result["psnr"] > result["psnr_noisy"]
    result = run_experiment({
        "task": "ksvd",
        "workspace": str(tmp_path / "wsc"),
        "data": {"images": ["lena"], "size": 48, "n_patches": 400,
                 "patch": 8, "color": True},
        "params": {"K": 32, "T": 3, "n_iter": 2},
    })
    with np.load(tmp_path / "wsc" / "D.npz") as z:
        assert z["D"].shape == (192, 32)     # 3 p^2 rows: color patches


def test_src_experiment():
    result = run_experiment({
        "task": "src",
        "data": {"dataset": "digits", "test_size": 0.5},
        "params": {"T": 5},
    })
    assert result["accuracy"] > 0.9


def test_inpaint_experiment():
    result = run_experiment({
        "task": "inpaint",
        "data": {"images": ["lena"], "size": 64, "K": 64, "seed": 1},
        "params": {"missing_frac": 0.25, "T": 6},
    })
    assert result["psnr_inpainted"] > result["psnr_corrupted"] + 10.0


def test_experiment_folder_dataset(tmp_path):
    # YAML 'folders' data source: class-per-subdirectory images -> encode
    import json

    import numpy as np
    from PIL import Image

    from lyssandra_tpu.experiments import run_experiment
    from lyssandra_tpu.utils import synthetic_image

    for cls, kind in (("s", "smooth"), ("t", "texture")):
        d = tmp_path / "ds" / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                synthetic_image(kind, 32, seed=i).astype(np.uint8)
            ).save(d / f"{i}.png")
    spec = {
        "task": "encode",
        "data": {"folders": str(tmp_path / "ds"), "n_patches": 512,
                 "patch": 8, "K": 64},
        "params": {"algorithm": "bomp", "T": 4},
    }
    res = run_experiment(spec)
    assert np.isfinite(res["rel_err"]) and res["n"] == 512
