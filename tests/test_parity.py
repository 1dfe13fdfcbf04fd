"""Parity-harness tests: golden scene round-trips the real parser, and the
train->eval->compare pipeline detects both agreement and regression."""

import json
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "scripts"))


def test_reference_scene_roundtrip(tmp_path):
    """write_reference_scene output parses back to the source scene."""
    from lsenerf_tpu.data.parser import ParserConfig, SceneParser
    from lsenerf_tpu.data.synthetic import make_synthetic_scene, write_reference_scene

    root = str(tmp_path / "scene")
    write_reference_scene(root, n_cams=6, h=16, w=16, focal=20.0)
    col_src, evs_src = make_synthetic_scene(n_cams=6, h=16, w=16, focal=20.0)

    sp = SceneParser(root, ParserConfig())
    col = sp.parse_color("train")
    evs = sp.parse_events()

    # poses survive the GL->CV->GL round trip
    n_train = len(col.cameras)
    np.testing.assert_allclose(
        np.asarray(col.cameras.camera_to_worlds),
        np.asarray(col_src.cameras.camera_to_worlds)[:n_train],
        atol=1e-5,
    )
    # images survive the 8-bit round trip
    np.testing.assert_allclose(
        col.images, col_src.images[:n_train], atol=1.0 / 255.0 + 1e-6
    )
    # event counts: int16 quantization of the analytic delta-log frames
    want = np.rint(np.asarray(evs_src.eimgs)[..., 0]).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(evs.eimgs)[..., 0], want)
    assert evs.e_thresh == evs_src.e_thresh


@pytest.mark.slow
def test_parity_harness_end_to_end(tmp_path):
    """Record a golden on a tiny CPU run, verify a re-run passes, and verify
    a perturbed golden fails — the harness actually detects regressions."""
    env = dict(
        JAX_PLATFORMS="cpu",
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/root",
    )
    golden = str(tmp_path / "golden.json")
    base = [
        sys.executable, osp.join(REPO, "scripts", "parity.py"),
        "--workdir", str(tmp_path / "w"),
        "--steps", "30",
        "--tiny",
        "--golden", golden,
    ]
    rec = subprocess.run(
        base + ["--update-golden"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert rec.returncode == 0, rec.stdout + rec.stderr
    assert osp.exists(golden)

    chk = subprocess.run(
        base, cwd=REPO, env=env, capture_output=True, text=True, timeout=1200
    )
    assert chk.returncode == 0, chk.stdout + chk.stderr
    assert "[parity] PASS" in chk.stdout

    with open(golden) as f:
        g = json.load(f)
    g["metrics"]["psnr"] += 5.0
    with open(golden, "w") as f:
        json.dump(g, f)
    bad = subprocess.run(
        base, cwd=REPO, env=env, capture_output=True, text=True, timeout=1200
    )
    assert bad.returncode == 1
    assert "REGRESSION psnr" in bad.stdout
