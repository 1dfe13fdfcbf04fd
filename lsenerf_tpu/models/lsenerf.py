"""LSENeRF model: volume rendering forward + mapper routing + loss assembly.

Capability parity with reference lsenerf.py `LSENeRFModel`:
  - exec_get_outputs (:278-326): march -> field -> weights -> rgb/depth/acc
  - get_outputs mapper routing (:329-377): map_mode in {evs_rgb, rgb_evs,
    co_map}, rgb_to_one reduction (learned ThreeToOne / fixed gray), deblur
    mean-of-4, train clamp(1e-5)/eval clamp[0,1]
  - get_loss_dict (:422-439): rgb mse (plain or deblur) + weighted event loss
  - config surface (:47-99) incl. string-"None" normalization

Pure functions over (params, config, occ grid state); a ModelConfig is static
at trace time so unused branches compile away — the TPU answer to DDP's
find_unused_parameters=True (train.py:96-98 via SURVEY section 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

import jax
import jax.numpy as jnp

from lsenerf_tpu.cameras.rays import RayBundle
from lsenerf_tpu.models import field as field_lib
from lsenerf_tpu.models import losses as loss_lib
from lsenerf_tpu.models import mappers as mapper_lib
from lsenerf_tpu.ops import composite, march
from lsenerf_tpu.ops import occupancy as occ_lib


def _norm_none(v):
    if isinstance(v, str) and v.lower() in ("none", "false"):
        return None
    return v


@dataclass(frozen=True)
class ModelConfig:
    field: field_lib.FieldConfig = dc_field(default_factory=field_lib.FieldConfig)
    grid: occ_lib.OccGridConfig = dc_field(default_factory=occ_lib.OccGridConfig)
    render_step_size: Optional[float] = None  # None -> scene diag / 1000
    near_plane: float = 0.05
    far_plane: float = 1e3
    cone_angle: float = 0.004
    alpha_thre: float = 0.01
    early_stop_eps: float = 1e-4
    max_samples: int = 48
    # candidate march steps must cover the scene: with the auto step
    # (diag/1000) and cone_angle=0.004, ~930 candidates reach the outer
    # contraction aabb (t~14); 512 would truncate the far field at t~2.5
    max_candidates: int = 1024
    # two-phase occupancy testing (ops/march.py): coarse segments of
    # `coarse_factor` candidates against an OR-downsampled supergrid first,
    # fine tests only inside up to `max_coarse_segments` occupied segments —
    # cuts the latency-bound occupancy gathers ~2x at identical steady-state
    # sampling
    hierarchical_march: bool = True
    coarse_factor: int = 8
    max_coarse_segments: int = 24
    # phase-1 supergrid lookups via one-hot MXU matmul (exact, small tables;
    # measured +4.5% flagship step throughput)
    supergrid_matmul: bool = True
    # phase-2 fine lookups from bit-packed per-supercell rows (~2 row
    # gathers per segment instead of coarse_factor per-midpoint gathers;
    # see ops/march.MarchConfig.packed_phase2)
    packed_phase2: bool = True
    # proposal-guided sample relocation (ops/march.MarchConfig
    # .proposal_samples): resample the max_samples occupancy-compacted
    # candidates down to this many field evaluations per ray, placed by
    # inverse-CDF over the occ grid's EMA densities. The step bottleneck
    # (hash-gather rows) scales with samples/ray, so this is the primary
    # throughput/quality knob. 0 = off (uniform placement over candidates).
    proposal_samples: int = 0
    proposal_uniform_frac: float = 0.2
    # evaluate the field only on chunks containing valid samples: samples are
    # validity-sorted and all-invalid chunks skipped via lax.cond — converts
    # occupancy-grid sparsity into real gather/FLOP savings despite the
    # static dense layout. 0 disables (default: on a fresh/dense grid every
    # chunk is valid, so this is pure overhead; enable for long runs once the
    # occupancy grid converges). Value = chunk size in samples.
    compact_chunk: int = 0
    background_color: str = "random"  # NGP eval background
    # Train metric "grad_overflow": number of hash-table gradient updates the
    # sorted windowed backward would drop this step (0 == exact backward; see
    # ops/hash_encoding.blocked_overflow_count). Costs ~one extra key sort
    # per step (~15% at flagship scale), so off by default — turn on when
    # validating a new scene/config against the overflow contract.
    grad_overflow_telemetry: bool = False

    evs_loss_weight: float = 1.0
    event_loss_type: str = "log_loss"  # or "enerf_norm_loss"
    rgb_loss_type: str = "linspace"  # or "deblur"
    use_mapping: bool = False
    mapping_method: str = "mlp"
    evs_mapping_method: Optional[str] = None
    map_mode: str = "evs_rgb"  # evs_rgb | rgb_evs | co_map
    ev_one_dim: Optional[str] = "learned"  # learned | gt | None

    def __post_init__(self):
        # compact_chunk permutes samples so the strided coarse-level path
        # (which needs the (n, k) ray structure) cannot compose with it; the
        # compact branch would win silently and the striding knob would
        # benchmark nothing (ADVICE r4).
        if self.compact_chunk > 0 and self.field.coarse_stride > 1:
            raise ValueError(
                "compact_chunk > 0 and field.coarse_stride > 1 are mutually "
                "exclusive: sample compaction destroys the per-ray sample "
                "structure the strided coarse-level encode lerps over. "
                "Disable one of the two."
            )

    def normalized(self) -> "ModelConfig":
        """String-"None"/"False" cleanup (reference lsenerf.py:86-99)."""
        from dataclasses import replace

        map_mode = self.map_mode
        if isinstance(map_mode, str) and map_mode.lower() == "none":
            map_mode = "evs_rgb"
        ev = self.ev_one_dim
        if isinstance(ev, str):
            if ev.lower() in ("false", "none"):
                ev = None
            elif ev.lower() == "true":
                ev = "learned"
        rgb_loss = self.rgb_loss_type
        if isinstance(rgb_loss, str) and rgb_loss.lower() == "none":
            rgb_loss = "linspace"
        return replace(
            self,
            map_mode=map_mode,
            ev_one_dim=ev,
            rgb_loss_type=rgb_loss,
            evs_mapping_method=_norm_none(self.evs_mapping_method),
        )

    def march_config(self) -> march.MarchConfig:
        step = self.render_step_size
        if step is None:
            # auto step: scene diag / 1000 (lsenerf.py:180-182)
            diag = 2.0 * self.field.aabb_scale * (3.0**0.5)
            step = diag / 1000.0
        return march.MarchConfig(
            render_step_size=step,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            cone_angle=self.cone_angle,
            alpha_thre=self.alpha_thre,
            early_stop_eps=self.early_stop_eps,
            max_samples=self.max_samples,
            max_candidates=self.max_candidates,
            hierarchical=self.hierarchical_march,
            coarse_factor=self.coarse_factor,
            max_coarse_segments=self.max_coarse_segments,
            supergrid_matmul=self.supergrid_matmul,
            packed_phase2=self.packed_phase2,
            proposal_samples=self.proposal_samples,
            proposal_uniform_frac=self.proposal_uniform_frac,
        )


def init_model(key: jax.Array, config: ModelConfig, num_imgs: int = 1) -> dict:
    """Model params: field + optional mappers + optional rgb->1 reducer."""
    k_field, k_map, k_evmap = jax.random.split(key, 3)
    params = {"field": field_lib.init_field(k_field, config.field, num_imgs)}
    if config.use_mapping:
        params["rgb_mapper"] = mapper_lib.init_mapper(config.mapping_method, k_map)
    if config.evs_mapping_method is not None and config.map_mode == "co_map":
        params["evs_mapper"] = mapper_lib.init_mapper(
            config.evs_mapping_method, k_evmap
        )
    if config.ev_one_dim == "learned":
        params["rgb_to_one"] = loss_lib.init_rgb_to_one("learned")
    return params


def render_bundle(
    params: dict,
    bundle: RayBundle,
    occ_state: occ_lib.OccGridState,
    config: ModelConfig,
    train: bool = True,
    rng=None,
) -> dict:
    """Volume-render a ray bundle (reference exec_get_outputs, lsenerf.py:278-326).

    When training with an rng key, the configured background (default
    "random") is blended into the rendered rgb, matching nerfstudio's
    training-mode RGBRenderer, which the reference uses for EVERY branch
    (LinearRenderer forces training mode, lse_renderer.py:4-11). This is
    load-bearing for mapper stability on scenes with empty space: without
    it, empty rays feed the constant clamp floor (1e-5) into x**pow_coeff
    whose log-gradient then drives the exponent unstably (the round-3
    golden-run NaN); with it they feed bounded random intensities, exactly
    like the reference."""
    mcfg = config.march_config()
    if not train and mcfg.proposal_samples:
        # proposal-guided sample relocation is a TRAINING-time speed lever;
        # eval renders evaluate every occupied sample like the reference
        # (nerfacc sampling has no reduced-budget mode,
        # lse_grid_estimator.py:93-143). Measured on the event-supervised
        # real-scale golden: rendering the F=16-trained model through the
        # F=16 sampler costs -0.24 dB / -0.019 SSIM purely at render time
        # (scripts/probe_eval_proposal.py).
        from dataclasses import replace as dc_replace

        mcfg = dc_replace(mcfg, proposal_samples=0)
    samples = march.march_rays(bundle, occ_state, config.grid, mcfg)
    n, k = samples.mask.shape

    app_id = bundle.metadata.get("appearance_id")
    if app_id is None:
        app_id = bundle.camera_indices
    app_ids = jnp.broadcast_to(app_id.reshape(n, 1), (n, k)).reshape(-1)

    positions = samples.positions.reshape(-1, 3)
    directions = samples.directions.reshape(-1, 3)
    nk = n * k
    if config.compact_chunk and nk > config.compact_chunk:
        density, rgb = _compact_field_eval(
            params["field"], positions, directions, app_ids,
            samples.mask.reshape(-1), config, train,
        )
    elif config.field.coarse_stride > 1 and k > config.field.coarse_stride:
        # strided coarse-level encoding needs the (n, k) ray structure, so
        # it rides the non-compact branch (compact_chunk permutes samples)
        t_mid = 0.5 * (samples.t_starts + samples.t_ends)
        density, rgb = field_lib.field_apply_strided(
            params["field"], samples.positions, t_mid, directions, app_ids,
            config.field, train=train,
        )
    else:
        density, rgb = field_lib.field_apply(
            params["field"], positions, directions, app_ids,
            config.field, train=train,
        )
    density = density.reshape(n, k, 1)
    rgb = rgb.reshape(n, k, 3)

    # dynamic culling threshold: min(alpha_thre, occs.mean()) — nerfacc's
    # rule (lse_grid_estimator.py:113). Early in training the EMA grid mean
    # is high (optimistic init) so the static value rules; once the grid
    # sparsifies the mean drops below it and culling relaxes with it.
    alpha_thre = config.alpha_thre
    if alpha_thre > 0.0:
        alpha_thre = jnp.minimum(alpha_thre, jnp.mean(occ_state.occs))
    weights = composite.render_weights(
        samples, density, alpha_thre, config.early_stop_eps
    )
    background = "linear"
    if train and rng is not None:
        background = config.background_color
    out = {
        "rgb": composite.render_rgb(weights, rgb, background=background, rng=rng),
        "depth": composite.render_depth(weights, samples),
        "accumulation": composite.render_accumulation(weights),
        "num_samples_per_ray": jnp.sum(samples.mask, axis=-1),
    }
    if (
        train
        and config.grad_overflow_telemetry
        and config.field.hash.layout == "blocked"
    ):
        from lsenerf_tpu.ops import hash_encoding as he

        unit, _ = field_lib.contract_positions(positions, config.field)
        out["grad_overflow"] = he.blocked_overflow_count(unit, config.field.hash)
    return out


def _compact_field_eval(field_params, positions, directions, app_ids, valid,
                        config, train):
    """Field evaluation that skips all-invalid sample chunks.

    The dense (n_rays, max_samples) layout evaluates every slot even when the
    occupancy mask invalidated most of them. Sorting samples by validity and
    lax.cond-skipping all-invalid chunks recovers the sparsity savings under
    fully static shapes: once the occupancy grid converges, typically >60% of
    slots are invalid and their chunks cost one predicate instead of 128
    hash gathers each.
    """
    from lsenerf_tpu.ops.fast_gather import permute

    nk = positions.shape[0]
    chunk = config.compact_chunk
    pad = (-nk) % chunk
    total = nk + pad

    if pad:
        positions = jnp.concatenate([positions, jnp.zeros((pad, 3), positions.dtype)])
        directions = jnp.concatenate([directions, jnp.zeros((pad, 3), directions.dtype)])
        app_ids = jnp.concatenate([app_ids, jnp.zeros((pad,), app_ids.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])

    order = jnp.argsort(~valid, stable=True)  # valid samples first
    inv = jnp.argsort(order)

    pos_s = permute(positions, order, inv)
    dir_s = permute(directions, order, inv)
    app_s = jnp.take(app_ids, order, axis=0)
    valid_s = jnp.take(valid, order, axis=0)

    n_chunks = total // chunk
    any_valid = valid_s.reshape(n_chunks, chunk).any(axis=1)

    def eval_chunk(args):
        p, d, a, go = args

        def live(_):
            return field_lib.field_apply(
                field_params, p, d, a, config.field, train=train
            )

        def dead(_):
            return (
                jnp.zeros((chunk, 1), jnp.float32),
                jnp.zeros((chunk, 3), jnp.float32),
            )

        return jax.lax.cond(go, live, dead, None)

    density_s, rgb_s = jax.lax.map(
        eval_chunk,
        (
            pos_s.reshape(n_chunks, chunk, 3),
            dir_s.reshape(n_chunks, chunk, 3),
            app_s.reshape(n_chunks, chunk),
            any_valid,
        ),
    )
    # un-permute back to ray-major order (gather-backed backward)
    density = permute(density_s.reshape(total, 1), inv, order)[:nk]
    rgb = permute(rgb_s.reshape(total, 3), inv, order)[:nk]
    return density, rgb


def _correct_evs_dim(params: dict, config: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    if config.ev_one_dim:
        return loss_lib.apply_rgb_to_one(
            config.ev_one_dim, params.get("rgb_to_one", {}), x
        )
    return x


def _format_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x] * 3, axis=-1) if x.shape[-1] == 1 else x


def postprocess_outputs(
    params: dict,
    out: dict,
    config: ModelConfig,
    train: bool = True,
    ev_out: bool = False,
) -> dict:
    """Mapper routing + deblur + clamping on raw render outputs
    (reference get_outputs tail, lsenerf.py:329-377). Split from the volume
    render so several ray bundles can share ONE render call (one hash
    gather/scatter instead of three) and be post-processed per-branch."""
    out = dict(out)
    clamp_out = jnp.clip(out["rgb"], min=1e-5)

    if config.use_mapping or config.map_mode == "rgb_evs":
        if config.map_mode == "rgb_evs":
            # vol_ren -> rgb -> evs
            if ev_out or not train:
                out["ev_out"] = mapper_lib.apply_mapper(
                    config.mapping_method,
                    params["rgb_mapper"],
                    _correct_evs_dim(params, config, clamp_out),
                )
                out["linear"] = _format_linear(out["ev_out"])
        elif config.map_mode == "evs_rgb":
            # vol_ren -> evs -> rgb
            out["ev_out"] = _correct_evs_dim(params, config, clamp_out)
            out["linear"] = clamp_out
            out["rgb"] = mapper_lib.apply_mapper(
                config.mapping_method, params["rgb_mapper"], out["linear"]
            )
        elif config.map_mode == "co_map":
            #             /---> rgb_mapper ---> rgb
            # NGP -> linear
            #             \---> evs_mapper ---> evs
            out["rgb"] = mapper_lib.apply_mapper(
                config.mapping_method, params["rgb_mapper"], clamp_out
            )
            if ev_out or not train:
                ev_linear = _correct_evs_dim(params, config, clamp_out)
                out["linear"] = clamp_out
                out["ev_linear"] = ev_linear
                out["ev_out"] = mapper_lib.apply_mapper(
                    config.evs_mapping_method, params["evs_mapper"], ev_linear
                )

    if config.rgb_loss_type == "deblur" and train and not ev_out:
        # mean over the 4 exposure-window rays (lsenerf.py:365-370)
        out["rgb"] = out["rgb"].reshape(-1, 4, 3).mean(axis=1)

    if not train:
        out["rgb"] = jnp.clip(out["rgb"], 0.0, 1.0)
    else:
        out["rgb"] = jnp.clip(out["rgb"], min=1e-5)
    return out


def model_forward(
    params: dict,
    bundle: RayBundle,
    occ_state: occ_lib.OccGridState,
    config: ModelConfig,
    train: bool = True,
    ev_out: bool = False,
    rng=None,
) -> dict:
    """Volume render + postprocess for a single bundle."""
    out = render_bundle(params, bundle, occ_state, config, train=train, rng=rng)
    return postprocess_outputs(params, out, config, train=train, ev_out=ev_out)


def concat_bundles(bundles):
    """Concatenate ray bundles along the ray axis (shared metadata keys)."""
    import jax

    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *bundles)


def slice_outputs(out: dict, start: int, stop: int) -> dict:
    return {k: v[start:stop] for k, v in out.items()}


def compute_losses(
    params: dict,
    config: ModelConfig,
    col_out: Optional[dict],
    prev_out: Optional[dict],
    next_out: Optional[dict],
    col_batch: Optional[dict],
    evs_batch: Optional[dict],
) -> dict:
    """Loss dict (reference get_loss_dict, lsenerf.py:422-439)."""
    loss_dict = {}
    if col_out is not None:
        loss_dict["rgb_loss"] = loss_lib.mse_loss(col_batch["image"], col_out["rgb"])
    if prev_out is not None:
        ev_key = "rgb" if not config.use_mapping else "ev_out"
        prev_in, next_in = prev_out[ev_key], next_out[ev_key]
        evs = evs_batch["image"]
        if prev_in.shape[-1] != 1:
            evs = jnp.concatenate([evs] * 3, axis=-1)
        if config.event_loss_type == "enerf_norm_loss":
            ev_loss = loss_lib.enerf_norm_loss(
                evs, prev_in, next_in, evs_batch["e_thresh"]
            )
        else:
            ev_loss = loss_lib.log_loss(evs, prev_in, next_in)
        loss_dict["event_loss"] = config.evs_loss_weight * ev_loss
    return loss_dict
