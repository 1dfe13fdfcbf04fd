"""Experiment configuration tree + CLI + YAML round-trip + eval-mode surgery.

Capability parity with the reference's three config mechanisms (SURVEY.md
section 5): (1) a typed dataclass tree addressable with dotted CLI flags in
the same spellings as the reference (--pipeline.model.map-mode,
--pipeline.datamanager.rgb_frac, --optimizers.fields.optimizer.lr, ...);
(2) `modify_config` post-parse surgery for eval / pretrain / render runs
(train.py:237-304), including reloading a saved YAML config and selectively
overriding it; (3) explicit run-mode flags threaded through the tree instead
of the reference's gbconfig globals.
"""

from __future__ import annotations

import argparse
import dataclasses
import os.path as osp
from dataclasses import dataclass, field as dc_field
from pathlib import Path
from typing import Optional

import yaml

from lsenerf_tpu.data.datamanager import DataManagerConfig
from lsenerf_tpu.data.parser import ParserConfig
from lsenerf_tpu.engine.trainer import (
    CameraOptConfig,
    OptimizerGroupConfig,
    TrainerConfig,
)
from lsenerf_tpu.models import embeddings as emb_lib
from lsenerf_tpu.models import field as field_lib
from lsenerf_tpu.models import lsenerf as model_lib
from lsenerf_tpu.ops import hash_encoding as he
from lsenerf_tpu.ops import occupancy as occ_lib


# ---------------------------------------------------------------------------
# CLI-facing dataclass tree (mutable; mirrors the reference flag names)
# ---------------------------------------------------------------------------


@dataclass
class AdamConfig:
    lr: float = 1e-2
    eps: float = 1e-15


@dataclass
class SchedulerConfig:
    lr_final: float = 1e-4
    max_steps: int = 200000
    warmup_steps: int = 0


@dataclass
class OptimizerSpec:
    optimizer: AdamConfig = dc_field(default_factory=AdamConfig)
    scheduler: SchedulerConfig = dc_field(default_factory=SchedulerConfig)


@dataclass
class OptimizersConfig:
    fields: OptimizerSpec = dc_field(default_factory=OptimizerSpec)
    camera_opt: OptimizerSpec = dc_field(
        default_factory=lambda: OptimizerSpec(
            optimizer=AdamConfig(lr=1e-3),
            scheduler=SchedulerConfig(lr_final=1e-4, max_steps=5000),
        )
    )


@dataclass
class ColDataparserConfig:
    data: str = ""
    scale_factor: float = 1.0
    scene_scale: float = 1.0
    use_gray: bool = False
    # alternate colcam-dir selection: train reads
    # <quality>_<image_type>_colcam_set when present (lse_parser.py:393-412)
    image_type: str = "gamma"
    quality: str = "clear"


@dataclass
class EvsDataparserConfig:
    data: str = ""
    scale_factor: float = 1.0
    scene_scale: float = 1.0
    e_thresh: str = "None"  # string-typed like the reference (lse_parser.py:270)
    event_type: str = "None"


@dataclass
class EmbedConfig:
    embedding_type: str = "global_emb"
    emb_dim: int = 32
    eval_mode: str = "zero"


@dataclass
class DataManagerCLI:
    data: str = ""
    col_dataparser: ColDataparserConfig = dc_field(default_factory=ColDataparserConfig)
    evs_dataparser: EvsDataparserConfig = dc_field(default_factory=EvsDataparserConfig)
    train_num_rays_per_batch: int = 3512
    eval_num_rays_per_batch: int = 1024
    rgb_frac: float = 0.66
    rgb_loss_mode: str = "mse"
    # C++ double-buffered batch prefetcher (native/fastloader.cpp); falls back
    # to the numpy sampler when the shared library is unavailable
    use_native: bool = False
    col_cam_optimizer: CameraOptConfig = dc_field(default_factory=CameraOptConfig)
    evs_cam_optimizer: CameraOptConfig = dc_field(default_factory=CameraOptConfig)


@dataclass
class ModelCLI:
    evs_loss_weight: float = 1.0
    # accepted for reference CLI parity; the reference declares but never
    # consumes these in any loss (lsenerf.py:52-78: emb_norm_weight,
    # use_mapper_loss/mapper_loss_weight, scaler_weight have no usage sites)
    emb_norm_weight: float = 1e-2
    use_mapper_loss: bool = False
    mapper_loss_weight: float = 0.25
    scaler_weight: float = 1.0
    event_loss_type: str = "log_loss"
    rgb_loss_type: str = "linspace"
    use_mapping: bool = False
    mapping_method: str = "mlp"
    evs_mapping_method: str = "None"
    map_mode: str = "evs_rgb"
    ev_one_dim: str = "learned"
    embed_config: EmbedConfig = dc_field(default_factory=EmbedConfig)
    eval_num_rays_per_chunk: int = 3512
    # field / grid capacity (NGP defaults, lse_field.py:130-137)
    num_levels: int = 16
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    grid_resolution: int = 128
    grid_levels: int = 4
    # occupancy refresh rate: fraction of cells per level per sampled update
    # (ops/occupancy.OccGridConfig.sample_fraction; 0.25 ~= nerfacc cadence)
    occ_sample_fraction: float = 0.03125
    max_samples: int = 48
    max_candidates: int = 1024
    hierarchical_march: bool = True
    coarse_factor: int = 8
    max_coarse_segments: int = 24
    supergrid_matmul: bool = True
    compact_chunk: int = 0
    # proposal-guided sample relocation: evaluate the field at this many
    # inverse-CDF-placed samples per ray instead of max_samples uniform
    # slots (ops/march.proposal_resample). -1 = auto: 16 (2.1x step
    # throughput, gated within +-0.5 dB on the RGB-only AND event-supervised
    # real-scale goldens, PERFORMANCE.md rounds 4-5) — except per-frame
    # event-embedding configs (evs_emb), where the embedding table memorizes
    # per-frame event-quadrature noise and the emb_eval golden fails its
    # gate (-0.52 dB / -0.058 SSIM), so auto resolves to 0 there. Explicit
    # values are always honored; 0 = reference-style
    # evaluate-every-occupied-candidate placement.
    proposal_samples: int = -1
    proposal_uniform_frac: float = 0.2
    # Annealed-F schedule (VERDICT r4 #3 de-risking): run the first N steps
    # with proposal OFF (all max_samples occupancy-compacted slots) before
    # switching to proposal_samples. Early in training the occ grid's EMA
    # densities are noise, which is exactly when inverse-CDF relocation is
    # least trustworthy; the warmup trains placement-free until the grid
    # converges (a few hundred steps), then takes the 2.1x step-rate. Costs
    # one extra compile at the switch. 0 = off (proposal from step 0).
    proposal_warmup_steps: int = 0
    disable_scene_contraction: bool = False
    background_color: str = "random"
    # TPU-first defaults, matching the published bench: bf16 compute/gather
    # (the tcnn-fp16 analog; reference trains tcnn fp16 too) and the blocked
    # 3x3x3-row hash layout (8x fewer gathers per sample). A default
    # train.py run was 6.2x slower than the bench before these were the
    # defaults (386 -> 62 ms/step on the golden scene, round-3 bisect).
    # Set "float32"/"ngp" for the reference-exact numerics path.
    compute_dtype: str = "bfloat16"
    # hash-table memory layout: "blocked" (TPU-first 3x3x3 block rows, 8x
    # fewer gathers per sample) or "ngp" (reference-exact per-vertex hash)
    hash_layout: str = "blocked"
    packed_phase2: bool = True
    # strided coarse-level sampling: encode hash levels [0, coarse_levels)
    # at every coarse_stride-th sample per ray and lerp in t between anchors
    # (models/field.field_apply_strided). 1 = off (exact plain path).
    coarse_stride: int = 1
    coarse_levels: int = 4
    # windowed-backward overflow counter surfaced as a train metric
    grad_overflow_telemetry: bool = False


@dataclass
class PipelineCLI:
    datamanager: DataManagerCLI = dc_field(default_factory=DataManagerCLI)
    model: ModelCLI = dc_field(default_factory=ModelCLI)


@dataclass
class MachineConfig:
    seed: int = 42
    num_devices: int = 1
    # Steps per device dispatch (lax.scan chunk). >1 amortizes host->device
    # dispatch latency (the dev chip sits behind a ~20 ms tunnel; a scan of
    # 16 gives the CLI the same throughput as bench.py). Logging/eval/save
    # cadences fire when their step falls inside a chunk. Single-device
    # only; ignored (forced 1) under a multi-device mesh.
    # 16 == the occupancy update interval == the bench protocol, so a default
    # single-device `train.py` run achieves the published bench throughput;
    # train.py forces 1 under a multi-device mesh (shard axis conflicts with
    # the scan stacking axis).
    scan_steps: int = 16


@dataclass
class ExperimentConfig:
    method_name: str = "lsenerf"
    experiment_name: str = "unnamed"
    output_dir: str = "outputs"
    timestamp: str = ""
    data: str = ""
    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_batch: int = 500  # reference lse_config.py:16
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 25000
    vis: str = "tensorboard"
    is_eval: bool = False
    emb_eval_mode: str = "zero"
    do_pretrain: bool = False
    is_render: bool = False
    load_dir: str = ""
    load_config: str = ""
    load_checkpoint: str = ""
    load_step: int = -1
    machine: MachineConfig = dc_field(default_factory=MachineConfig)
    pipeline: PipelineCLI = dc_field(default_factory=PipelineCLI)
    optimizers: OptimizersConfig = dc_field(default_factory=OptimizersConfig)

    def base_dir(self) -> str:
        return osp.join(
            self.output_dir, self.experiment_name, self.method_name, self.timestamp
        )


# ---------------------------------------------------------------------------
# dotted-flag CLI over the dataclass tree
# ---------------------------------------------------------------------------


def _walk_fields(cls, prefix=""):
    import typing

    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        name = f"{prefix}{f.name}"
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            yield from _walk_fields(ftype, prefix=f"{name}.")
        else:
            yield name, ftype


def add_config_args(parser: argparse.ArgumentParser, cls=ExperimentConfig):
    for dotted, ftype in _walk_fields(cls):
        names = ["--" + dotted]
        if ftype is bool or ftype == "bool":
            parser.add_argument(*names, dest=dotted, type=_parse_bool, default=None)
        elif ftype in (int, "int"):
            parser.add_argument(*names, dest=dotted, type=int, default=None)
        elif ftype in (float, "float"):
            parser.add_argument(*names, dest=dotted, type=float, default=None)
        else:
            parser.add_argument(*names, dest=dotted, type=str, default=None)
    return parser


def _parse_bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")


def apply_overrides(config: ExperimentConfig, ns: argparse.Namespace):
    for dotted, value in vars(ns).items():
        if value is None or "." not in dotted and not hasattr(config, dotted):
            continue
        if value is None:
            continue
        obj = config
        parts = dotted.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        if hasattr(obj, parts[-1]):
            setattr(obj, parts[-1], value)
    return config


def _normalize_argv(argv):
    """Accept any dash/underscore mix in flag names (tyro-style): the
    canonical registered spelling is all-underscore."""
    out = []
    for tok in argv:
        if tok.startswith("--"):
            if "=" in tok:
                name, val = tok[2:].split("=", 1)
                out.append("--" + name.replace("-", "_") + "=" + val)
            else:
                out.append("--" + tok[2:].replace("-", "_"))
        else:
            out.append(tok)
    return out


def parse_cli(argv=None) -> ExperimentConfig:
    parser = argparse.ArgumentParser(
        prog="train.py", description="LSENeRF-TPU trainer"
    )
    parser.add_argument("method", nargs="?", default="lsenerf")
    add_config_args(parser)
    import sys as _sys

    argv = _sys.argv[1:] if argv is None else list(argv)
    ns = parser.parse_args(_normalize_argv(argv))
    config = ExperimentConfig(method_name=ns.method)
    return apply_overrides(config, ns)


# ---------------------------------------------------------------------------
# YAML round trip
# ---------------------------------------------------------------------------


def to_dict(config) -> dict:
    return dataclasses.asdict(config)


def from_dict(cls, d: dict):
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            kwargs[f.name] = from_dict(ftype, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(config: ExperimentConfig, path: str):
    import os

    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(config), f, sort_keys=False)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return from_dict(ExperimentConfig, yaml.safe_load(f))


# ---------------------------------------------------------------------------
# modify_config: eval / pretrain / render surgery (reference train.py:237-304)
# ---------------------------------------------------------------------------


def modify_config(config: ExperimentConfig) -> ExperimentConfig:
    if config.load_config:
        ori = config
        config = load_config(config.load_config)
        # selectively keep the CLI-run's overrides (train.py:239-260)
        for k in (
            "load_dir", "max_num_iterations", "steps_per_eval_image",
            "steps_per_eval_all_images", "steps_per_save", "timestamp",
            "emb_eval_mode", "is_eval", "do_pretrain", "is_render",
        ):
            setattr(config, k, getattr(ori, k))
        config.pipeline.datamanager.col_dataparser.image_type = (
            ori.pipeline.datamanager.col_dataparser.image_type
        )
        config.pipeline.datamanager.col_dataparser.quality = (
            ori.pipeline.datamanager.col_dataparser.quality
        )
        if ori.output_dir != "outputs":
            config.output_dir = ori.output_dir
        if ori.data:
            config.data = ori.data
        config.pipeline.model.eval_num_rays_per_chunk = (
            ori.pipeline.model.eval_num_rays_per_chunk
        )

        if config.is_eval:
            from lsenerf_tpu.engine.checkpoints import latest_step

            scene_tag = osp.basename(osp.dirname(str(ori.load_dir)))
            config.method_name = osp.join(
                config.method_name, f"{scene_tag}_eval_{config.emb_eval_mode}"
            )
            load = latest_step(str(ori.load_dir)) or 0
            config.steps_per_eval_all_images = load + config.max_num_iterations - 5
            config.pipeline.model.embed_config.eval_mode = config.emb_eval_mode
            if not config.do_pretrain:
                config.pipeline.model.rgb_loss_type = "linspace"
                config.pipeline.datamanager.rgb_loss_mode = "mse"
            else:
                config.steps_per_eval_all_images = (
                    load + config.max_num_iterations + 1000
                )
        else:
            scene_tag = osp.basename(osp.dirname(str(ori.load_dir)))
            config.method_name = osp.join(config.method_name, f"{scene_tag}_camopt")

        config.pipeline.datamanager.col_cam_optimizer.mode = "SO3xR3"
        if config.do_pretrain and config.pipeline.model.embed_config.eval_mode == "param":
            config.pipeline.model.rgb_loss_type = "deblur"
            config.pipeline.datamanager.rgb_loss_mode = "deblur"
        elif config.do_pretrain:
            raise ValueError("pretrain only makes sense with eval_mode='param'")
        else:
            config.pipeline.datamanager.col_cam_optimizer.optim_type = "ns"
        config.pipeline.datamanager.col_cam_optimizer.scheme = "active"

    if config.pipeline.model.rgb_loss_type == "deblur":
        config.pipeline.datamanager.rgb_loss_mode = "deblur"
        config.pipeline.datamanager.col_cam_optimizer.optim_type = "spline"

    if config.is_eval:
        # eval trains camera-opt on RGB only (lse_datamanager.py:218-220)
        config.pipeline.datamanager.rgb_frac = 1.0
    return config


# ---------------------------------------------------------------------------
# lowering: CLI tree -> runtime configs
# ---------------------------------------------------------------------------


def _resolve_proposal_samples(config: "ExperimentConfig") -> int:
    """-1 (auto) -> 16, except evs_emb configs where the per-frame embedding
    table memorizes event-quadrature noise (emb_eval golden -0.52 dB /
    -0.058 SSIM at F=16, scripts/golden_parity.json real_scale_emb_prop16)
    -> 0. Eval-protocol stages (is_eval / do_pretrain) always 0: they are
    short frozen-field refinements whose sole purpose is eval quality."""
    if config.is_eval or config.do_pretrain:
        return 0
    m = config.pipeline.model
    if m.proposal_samples >= 0:
        return m.proposal_samples
    return 0 if m.embed_config.embedding_type == "evs_emb" else 16


def build_runtime_configs(config: ExperimentConfig):
    """ExperimentConfig -> (TrainerConfig, ModelConfig, DataManagerConfig,
    ParserConfig x2)."""
    m = config.pipeline.model
    dm = config.pipeline.datamanager

    scene_scale = dm.col_dataparser.scene_scale
    model_cfg = model_lib.ModelConfig(
        field=field_lib.FieldConfig(
            aabb_scale=scene_scale,
            use_contraction=not m.disable_scene_contraction,
            hash=he.HashEncodingConfig(
                num_levels=m.num_levels,
                log2_hashmap_size=m.log2_hashmap_size,
                base_res=m.base_res,
                max_res=m.max_res,
                gather_dtype=m.compute_dtype,
                layout=m.hash_layout,
            ),
            embedding=emb_lib.EmbeddingConfig(
                embedding_type=m.embed_config.embedding_type,
                emb_dim=m.embed_config.emb_dim,
                eval_mode=m.embed_config.eval_mode,
                is_eval=config.is_eval,
            ),
            compute_dtype=m.compute_dtype,
            coarse_stride=m.coarse_stride,
            coarse_levels=m.coarse_levels,
        ),
        grid=occ_lib.OccGridConfig(
            resolution=m.grid_resolution,
            levels=m.grid_levels,
            aabb_scale=scene_scale,
            sample_fraction=m.occ_sample_fraction,
        ),
        max_samples=m.max_samples,
        max_candidates=m.max_candidates,
        hierarchical_march=m.hierarchical_march,
        coarse_factor=m.coarse_factor,
        max_coarse_segments=m.max_coarse_segments,
        supergrid_matmul=m.supergrid_matmul,
        packed_phase2=m.packed_phase2,
        # proposal relocation is a speed lever for the long MAIN training
        # run; eval-protocol refinement stages (eval.sh camera-opt,
        # emb_eval.sh test-embedding pretrain) are short frozen-field
        # optimizations whose sole purpose is eval quality — fitting poses /
        # embeddings through the reduced F-sample renderer against
        # full-sampler final renders bakes in a quadrature mismatch
        # (measured: emb_eval SSIM 0.717 vs 0.776, PERFORMANCE.md round 5).
        # The reference runs these stages with its full nerfacc sampler.
        proposal_samples=_resolve_proposal_samples(config),
        proposal_uniform_frac=m.proposal_uniform_frac,
        grad_overflow_telemetry=m.grad_overflow_telemetry,
        compact_chunk=m.compact_chunk,
        background_color=m.background_color,
        evs_loss_weight=m.evs_loss_weight,
        event_loss_type=m.event_loss_type,
        rgb_loss_type=m.rgb_loss_type,
        use_mapping=m.use_mapping,
        mapping_method=m.mapping_method,
        evs_mapping_method=m.evs_mapping_method,
        map_mode=m.map_mode,
        ev_one_dim=m.ev_one_dim,
    ).normalized()

    def group(spec: OptimizerSpec) -> OptimizerGroupConfig:
        return OptimizerGroupConfig(
            lr=spec.optimizer.lr,
            eps=spec.optimizer.eps,
            lr_final=spec.scheduler.lr_final,
            max_steps=spec.scheduler.max_steps,
            warmup_steps=spec.scheduler.warmup_steps,
        )

    from lsenerf_tpu.engine.trainer import RunMode

    if config.do_pretrain:
        mode = RunMode.PRETRAIN
    elif config.is_render:
        mode = RunMode.RENDER
    elif config.is_eval:
        mode = RunMode.EVAL
    else:
        mode = RunMode.TRAIN

    trainer_cfg = TrainerConfig(
        max_num_iterations=config.max_num_iterations,
        steps_per_save=config.steps_per_save,
        steps_per_eval_batch=config.steps_per_eval_batch,
        steps_per_eval_image=config.steps_per_eval_image,
        steps_per_eval_all_images=config.steps_per_eval_all_images,
        seed=config.machine.seed,
        mode=mode,
        fields_optimizer=group(config.optimizers.fields),
        camera_optimizer=group(config.optimizers.camera_opt),
        col_cam_opt=dm.col_cam_optimizer,
        evs_cam_opt=dm.evs_cam_optimizer,
    )

    dm_cfg = DataManagerConfig(
        train_num_rays_per_batch=dm.train_num_rays_per_batch,
        rgb_frac=dm.rgb_frac,
        rgb_loss_mode=dm.rgb_loss_mode,
        eval_num_rays_per_batch=dm.eval_num_rays_per_batch,
        use_native=dm.use_native,
    )

    e_thresh = dm.evs_dataparser.e_thresh
    e_thresh = None if str(e_thresh).lower() == "none" else float(e_thresh)
    event_type = dm.evs_dataparser.event_type
    event_type = None if str(event_type).lower() == "none" else event_type
    parser_cfg = ParserConfig(
        scale_factor=dm.col_dataparser.scale_factor,
        scene_scale=scene_scale,
        use_gray=dm.col_dataparser.use_gray,
        e_thresh=e_thresh,
        event_type=event_type,
        quality=dm.col_dataparser.quality,
        image_type=dm.col_dataparser.image_type,
    )
    return trainer_cfg, model_cfg, dm_cfg, parser_cfg
