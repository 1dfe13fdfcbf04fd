"""Eval artifact writer: per-key PNG dirs, combined grids, metrics JSON,
mapper response-curve plots.

Capability parity with reference lse_writer.py `LSEWriter` (:45-112) and the
plt_mapper helper (utils.py:50-79): eval_results/<key>/NNN.png per output
image, comb_imgs/NNN.png grids, eval_metrics.json + eval_mean.json, and
learned-gamma curve plots with linear-value histograms. Plus a minimal
scalar logger (JSONL + optional TensorBoard via tf.summary if available)
standing in for the nerfstudio writer stack.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import subprocess

import numpy as np


def get_git_hash() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True
            ).stdout.strip()
            or "unknown"
        )
    except OSError:
        return "unknown"


def write_git_hash_txt(log_dir: str):
    """Reproducibility stamp (reference lse_pipeline.py:40-51)."""
    os.makedirs(log_dir, exist_ok=True)
    path = osp.join(log_dir, "commit_hash.txt")
    if not osp.exists(path):
        with open(path, "w") as f:
            f.write(get_git_hash())


class LSEWriter:
    """Disk writer for eval outputs."""

    SKIP_KEYS = ("accumulation", "ev_linear", "num_samples_per_ray")

    def __init__(self, log_dir: str):
        self.log_dir = osp.join(log_dir, "eval_results")
        os.makedirs(self.log_dir, exist_ok=True)
        self.comb_dir = osp.join(self.log_dir, "comb_imgs")
        os.makedirs(self.comb_dir, exist_ok=True)
        self.cnt = 0

    def _write_image(self, path: str, image: np.ndarray) -> np.ndarray:
        from PIL import Image

        data = np.clip(np.asarray(image) * 255, 0, 255).astype(np.uint8)
        if data.ndim == 2:
            data = data[..., None]
        if data.shape[-1] != 3:
            data = np.tile(data, (1, 1, 3))
        Image.fromarray(data).save(path)
        return data

    def log_images(self, output_img_dict: dict):
        all_imgs = []
        for k, v in output_img_dict.items():
            if k in self.SKIP_KEYS:
                continue
            save_dir = osp.join(self.log_dir, k)
            os.makedirs(save_dir, exist_ok=True)
            v = np.asarray(v)
            if k == "linear" and v.max() > 0:
                v = v / v.max()
            data = self._write_image(
                osp.join(save_dir, f"{self.cnt:03d}.png"), v
            )
            all_imgs.append(data)
        if all_imgs:
            h = max(a.shape[0] for a in all_imgs)
            padded = [
                np.pad(a, ((0, h - a.shape[0]), (0, 0), (0, 0))) for a in all_imgs
            ]
            grid = np.concatenate(padded, axis=1)
            from PIL import Image

            Image.fromarray(grid).save(osp.join(self.comb_dir, f"{self.cnt:03d}.png"))
        self.cnt += 1

    def log_metrics(self, metrics_dict_list: list):
        """eval_metrics.json (per-image lists) + eval_mean.json
        (reference lse_writer.py:67-77)."""
        keys = metrics_dict_list[0].keys()
        metrics = {k: [m[k] for m in metrics_dict_list] for k in keys}
        base = osp.dirname(self.log_dir)
        with open(osp.join(base, "eval_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=4)
        means = {k: float(np.nanmean(np.asarray(v, np.float64))) for k, v in metrics.items()}
        with open(osp.join(base, "eval_mean.json"), "w") as f:
            json.dump(means, f, indent=4)
        return means

    def plt_mapper(
        self, mapper_name: str, mapper_params: dict, which: str = "rgb",
        linear_img: np.ndarray = None, gt_fn=lambda x: x ** (1 / 2.4),
    ):
        """Response-curve plot (reference lse_writer.py:80-112, utils.py:50-79)."""
        import matplotlib

        matplotlib.use("Agg")
        import jax.numpy as jnp
        import matplotlib.pyplot as plt

        from lsenerf_tpu.models import mappers as mapper_lib

        save_dir = osp.join(osp.dirname(self.log_dir), f"{which}_mappers")
        os.makedirs(save_dir, exist_ok=True)
        n_saved = len(
            [f for f in os.listdir(save_dir) if f.startswith("learned_gamma")]
        )
        save_path = osp.join(save_dir, f"learned_gamma_{n_saved:03d}.png")

        max_val = 1.0
        if linear_img is not None:
            lin_max = float(np.max(linear_img))
            max_val = lin_max if (lin_max > 1 or lin_max < 0.7) else 1.0
        lins = np.linspace(0, max_val, 1000).reshape(-1, 1)
        out = np.asarray(
            mapper_lib.apply_mapper(mapper_name, mapper_params, jnp.asarray(lins))
        )
        plt.plot(lins, out, label="pred")
        if gt_fn is not None:
            plt.plot(lins, gt_fn(lins), label="gt")
        if linear_img is not None:
            linear = np.asarray(linear_img).reshape(-1)
            counts, bin_edges = np.histogram(linear, bins=50)
            weight_factor = out.max() / max(counts.max(), 1)
            plt.hist(linear, bins=bin_edges,
                     weights=np.ones_like(linear) * weight_factor)
        plt.legend()
        plt.savefig(save_path)
        plt.clf()
        return save_path


class ScalarLogger:
    """Train-time scalar sink: JSONL always; TensorBoard when tf is importable
    (reference uses vis='tensorboard', lse_config.py:40)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(log_dir)
            except (ImportError, RuntimeError):
                self.tb = None

    def log(self, step: int, scalars: dict):
        self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)

    def close(self):
        self.jsonl.close()
