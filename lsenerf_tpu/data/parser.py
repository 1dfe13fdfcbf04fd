"""On-disk dataset parser for the LSENeRF-formatter layout.

Capability parity with reference lse_parser.py: per-frame camera JSONs
(orientation/position/focal_length/principal_point/distortions/t, :147-206),
OpenCV-w2c -> OpenGL-c2w conversion (cv_to_working :47-62), metadata.json
appearance ids (:132-145), dataset.json train/val splits incl. the IS_EVAL
half_train_ids/val swap (:410-453), scene.json e_thresh (:344-352), msk.npy,
memmapped eimgs/eimgs_1x.npy event frames (:313-321), prev_camera/next_camera
dirs (:295-309), and the rel_cam.json + colmap_scale -> rigid RGB->event
extrinsic dM (:208-242).

Expected tree (<root> = the scene dir passed as --data):
    <root>/colcam_set/{camera/*.json, rgb/1x/*.png|jpg, dataset.json, metadata.json}
    <root>/ecam_set/{camera/*.json, eimgs/eimgs_1x.npy, dataset.json, scene.json,
                     metadata.json, prev_camera/, next_camera/}
    <root>/rel_cam.json
"""

from __future__ import annotations

import glob
import json
import os.path as osp
from dataclasses import dataclass
from typing import Optional

import numpy as np

from lsenerf_tpu.cameras.cameras import Cameras
from lsenerf_tpu.data.dataset import (
    ColorDataset,
    EventFrameDataset,
    LazyFrameArray,
)


def load_json(path):
    if not osp.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def cv_to_working(w2c: np.ndarray) -> np.ndarray:
    """OpenCV world-to-cam (4x4) -> OpenGL cam-to-world (4x4)
    (reference lse_parser.py:47-62)."""
    c2w = np.copy(w2c)
    mtx, pos = w2c[:3, :3], w2c[:3, 3]
    pos = -mtx.T @ pos
    right, up, forward = mtx
    mtx = np.stack([right, -up, -forward])
    c2w[:3, :3] = mtx.T
    c2w[:3, 3] = pos
    return c2w


@dataclass
class ParserConfig:
    scale_factor: float = 1.0  # world-translation scale
    scene_scale: float = 1.0  # aabb half-extent
    use_gray: bool = False
    e_thresh: Optional[float] = None  # override dataset e_thresh
    event_type: Optional[str] = None  # alternate ecam dir (e.g. "decam_set")
    # alternate colcam-dir selection (reference lse_parser.py:393-412):
    # train reads <quality>_<image_type>_colcam_set when that dir exists;
    # eval/val always read the "clear"-quality variant
    quality: str = "clear"
    image_type: str = "gamma"


class SceneParser:
    """Parses one scene directory into Color / EventFrame datasets."""

    def __init__(self, root: str, config: ParserConfig = None):
        self.root = root
        self.config = config or ParserConfig()
        self.col_dir = osp.join(root, "colcam_set")
        evs_name = self.config.event_type or "ecam_set"
        self.evs_dir = osp.join(root, evs_name)

    def _get_img_dir(self, *nargs) -> str:
        """<quality>_<image_type>_colcam_set when present, else colcam_set
        (reference _get_img_dir, lse_parser.py:393-412)."""
        prefix = "".join(f"{e}_" for e in nargs if e)
        alt = osp.join(self.root, prefix + "colcam_set")
        if prefix and osp.exists(alt):
            return alt
        if prefix and prefix != "clear_gamma_":
            print(
                "[parser] colcam quality/image_type provided but "
                f"{alt} does not exist, loading default colcam_set"
            )
        return self.col_dir

    def _col_dir_for_split(self, split: str) -> str:
        quality = self.config.quality if split == "train" else "clear"
        return self._get_img_dir(quality, self.config.image_type)

    # -- shared camera handling ---------------------------------------------

    def _load_cam_jsons(self, cam_dir: str, idxs=None):
        fs = sorted(glob.glob(osp.join(cam_dir, "*.json")))
        if idxs is not None:
            fs = [fs[i] for i in idxs if i < len(fs)]
        return [load_json(f) for f in fs]

    def _cam_translation(self, data_dir: str):
        t = load_json(osp.join(data_dir, "camera_transform.json"))
        return None if t is None else np.asarray(t["translation"])

    def _format_cameras(self, cam_data: list, data_dir: str):
        """Camera JSONs -> (Cameras, original OpenCV w2c mats).

        Reference lse_parser.py:147-206: w2c built from orientation/position,
        optional camera_transform translation, cv->gl conversion, translation
        scaled by scale_factor; single shared intrinsic from frame 0.
        """
        import jax.numpy as jnp

        translation = self._cam_translation(data_dir)
        n = len(cam_data)
        mtxs = np.tile(np.eye(4)[None], (n, 1, 1)).astype(np.float32)
        ori_mtxs = np.zeros((n, 4, 4), dtype=np.float32)
        times = []
        for i, datum in enumerate(cam_data):
            mtx_ori = np.asarray(datum["orientation"])
            pos = np.asarray(datum["position"]).reshape(3, 1)
            if translation is not None:
                pos = pos + translation.reshape(3, 1)
            w2c = np.concatenate([mtx_ori, -mtx_ori @ pos], axis=1)
            w2c = np.concatenate([w2c, np.array([[0, 0, 0, 1.0]])], 0)
            ori_mtxs[i] = w2c
            mtxs[i, :3, :4] = cv_to_working(w2c)[:3, :4]
            if datum.get("t") is not None:
                times.append(float(datum["t"]))

        mtxs[:, :3, 3] *= self.config.scale_factor

        datum = cam_data[0]
        cx, cy = datum["principal_point"]
        w, h = datum["image_size"]
        k1, k2, k3 = datum["radial_distortion"]
        p1, p2 = datum["tangential_distortion"]
        distortion = np.array([k1, k2, k3, 0.0, p1, p2], np.float32)
        cams = Cameras(
            camera_to_worlds=jnp.asarray(mtxs[:, :3, :4]),
            fx=float(datum["focal_length"]),
            fy=float(datum["focal_length"]),
            cx=float(cx),
            cy=float(cy),
            width=int(w),
            height=int(h),
            distortion_params=(
                None if np.abs(distortion).sum() == 0 else jnp.asarray(distortion)
            ),
            times=jnp.asarray(times, dtype=jnp.float32) if times else None,
        )
        return cams, ori_mtxs

    def _compute_dM(self, ori_mtxs: np.ndarray, data_dir: str):
        """Rigid RGB->event extrinsic in GL space (lse_parser.py:208-242):
        R_evs_gl_c2w = R_rgb_gl_c2w @ dM."""
        meta = load_json(osp.join(data_dir, "metadata.json"))
        if meta is None or meta.get("colmap_scale") is None:
            return None
        colmap_scale = meta["colmap_scale"]
        rel = load_json(osp.join(osp.dirname(data_dir), "rel_cam.json"))
        if rel is None:
            return None
        R = np.asarray(rel["R"])
        T = np.asarray(rel["T"]) * colmap_scale
        dM = np.concatenate([R, T.reshape(-1, 1)], axis=1)
        dM = np.concatenate([dM, np.array([[0, 0, 0, 1.0]])], 0)

        Mes = np.stack([dM @ m for m in ori_mtxs])
        Mrgs = np.stack([cv_to_working(m) for m in ori_mtxs])
        Megs = np.stack([cv_to_working(m) for m in Mes])
        Mrgs[:, :3, 3] *= self.config.scale_factor
        Megs[:, :3, 3] *= self.config.scale_factor
        dr1 = np.linalg.inv(Mrgs[0]) @ Megs[0]
        if len(Mrgs) > 5:
            dr2 = np.linalg.inv(Mrgs[5]) @ Megs[5]
            assert (np.abs(dr1 - dr2) < 1e-5).all(), "relative extrinsics inconsistent"
        return dr1.astype(np.float32)

    def _load_metadata_ids(self, data_dir: str):
        meta = load_json(osp.join(data_dir, "metadata.json")) or {}
        ids = {}
        for k, v in meta.items():
            try:
                ids[int(k)] = v["appearance_id"]
            except (ValueError, TypeError, KeyError):
                continue
        return [ids[k] for k in sorted(ids)]

    def _load_msk(self, data_dir: str, data_idxs=None):
        f = osp.join(data_dir, "msk.npy")
        if not osp.exists(f):
            return None
        msk = np.load(f)
        if data_idxs is not None and msk.ndim == 3:
            msk = np.stack([msk[i] for i in data_idxs])
        return msk

    # -- color ---------------------------------------------------------------

    def parse_color(self, split: str = "train", is_eval: bool = False,
                    do_pretrain: bool = False) -> ColorDataset:
        """split handling incl. the eval-mode swap (lse_parser.py:410-430):
        IS_EVAL trains camera-opt on half_train_ids if present, else on the
        val split."""
        d = self._col_dir_for_split(split)
        dataset_meta = load_json(osp.join(d, "dataset.json"))
        split_map = {"train": "train_ids", "test": "val_ids", "val": "val_ids"}
        if split == "train" and is_eval and dataset_meta.get("half_train_ids"):
            id_key = "half_train_ids"
        else:
            eff_split = "val" if (is_eval and not do_pretrain) else split
            id_key = split_map[eff_split]

        img_fs = sorted(glob.glob(osp.join(d, "rgb", "1x", "*.[pj][np]g")))
        data_idxs = sorted(int(e) for e in dataset_meta[id_key])
        data_idxs = [i for i in data_idxs if i < len(img_fs) - 1]

        cam_data = self._load_cam_jsons(osp.join(d, "camera"))
        cam_sel = [cam_data[i] for i in data_idxs]
        cams, ori_mtxs = self._format_cameras(cam_sel, d)
        dM = self._compute_dM(ori_mtxs, d)

        app_ids = self._load_metadata_ids(d)
        appearance_ids = np.asarray([app_ids[i] for i in data_idxs], np.int32)

        from PIL import Image

        images = np.stack(
            [
                np.asarray(Image.open(img_fs[i]).convert("RGB"), np.float32) / 255.0
                for i in data_idxs
            ]
        )
        ds = ColorDataset(
            images=images,
            cameras=cams,
            appearance_ids=appearance_ids,
            msk=self._load_msk(d, data_idxs),
            use_gray=self.config.use_gray,
        )
        ds.dM = dM
        ds.data_idxs = data_idxs
        return ds

    def color_train_ts(self):
        """Timestamps of the train RGB cameras (CameraIdxFixer input,
        lse_parser.py:473-482)."""
        d = self.col_dir
        dataset_meta = load_json(osp.join(d, "dataset.json"))
        img_fs = sorted(glob.glob(osp.join(d, "rgb", "1x", "*.[pj][np]g")))
        idxs = sorted(int(e) for e in dataset_meta["train_ids"])
        idxs = [i for i in idxs if i < len(img_fs) - 1]
        cam_data = self._load_cam_jsons(osp.join(d, "camera"))
        if cam_data[idxs[0]].get("t") is None:
            return None
        return np.asarray([cam_data[i]["t"] for i in idxs], np.float32)

    def all_color_cameras(self) -> Cameras:
        """Full trajectory for spline control points (lse_parser.py:455-463):
        full_camera/ dir if present, else all-but-last camera jsons."""
        d = self.col_dir
        full_dir = osp.join(d, "full_camera")
        if osp.exists(full_dir):
            cam_data = self._load_cam_jsons(full_dir)
        else:
            cam_data = self._load_cam_jsons(osp.join(d, "camera"))[:-1]
        return self._format_cameras(cam_data, d)[0]

    # -- events --------------------------------------------------------------

    def parse_events(self) -> EventFrameDataset:
        d = self.evs_dir
        dataset_meta = load_json(osp.join(d, "dataset.json"))
        data_idxs = sorted(int(e) for e in dataset_meta["train_ids"])

        # Event frames stay memmapped through batch gathers (multi-GB for
        # >1000-frame VGA sets); see LazyFrameArray. The reference bounds RAM
        # differently via CacheDataloader subsets (lse_datamanager.py:258-283).
        src = np.load(osp.join(d, "eimgs", "eimgs_1x.npy"), mmap_mode="r")
        eimgs = LazyFrameArray(src, data_idxs)

        prev_dir = osp.join(d, "prev_camera")
        prev_cams = next_cams = None
        if osp.exists(prev_dir):
            prev_cams, _ = self._format_cameras(
                self._load_cam_jsons(prev_dir, data_idxs), d
            )
            next_cams, _ = self._format_cameras(
                self._load_cam_jsons(osp.join(d, "next_camera"), data_idxs), d
            )
            cams = prev_cams
        else:
            cams, _ = self._format_cameras(
                self._load_cam_jsons(osp.join(d, "camera")), d
            )

        scene = load_json(osp.join(d, "scene.json"))
        e_thresh = 0.2
        if scene is not None and scene.get("e_thresh") is not None:
            e_thresh = scene["e_thresh"]
        if self.config.e_thresh is not None:
            e_thresh = self.config.e_thresh
        if self.config.event_type == "decam_set":
            e_thresh = 1

        app_ids = self._load_metadata_ids(d)
        appearance_ids = np.asarray([app_ids[i] for i in data_idxs], np.int32)

        return EventFrameDataset(
            eimgs=eimgs,
            cameras=cams,
            e_thresh=e_thresh,
            appearance_ids=appearance_ids,
            prev_cameras=prev_cams,
            next_cameras=next_cams,
            msk=self._load_msk(d),
        )

    def max_appearance_id(self) -> int:
        ids = []
        for d in (self.col_dir, self.evs_dir):
            got = self._load_metadata_ids(d)
            if got:
                ids.append(max(got))
        return max(ids) + 1 if ids else 1
