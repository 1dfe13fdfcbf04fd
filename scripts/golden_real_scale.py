"""Real-scale parity golden: full reference protocol on a VGA-class scene.

VERDICT r2 #5: the ±0.1 dB parity north star needs in-tree evidence at a
realistic profile. This writes a VGA (640x480), 200-frame synthetic scene in
the exact reference on-disk layout — WITH prev/next event cameras, masks,
and a dense full_camera trajectory — then runs the reference HEADLINE
protocol end to end on the chip:

  1. train: deblur x4 RGB + spline camera opt + co_map/powpow, seed 96
     (scripts/train_lse_data.sh settings; step count configurable — the
     paper uses 200,010, the method default is 30,000)
  2. eval.sh protocol: 6,010-step camera-pose refinement on the frozen
     NeRF, then full-image eval over the val split

Records metrics + wall time into scripts/golden_parity.json under
"real_scale". Reproduce with:

    python scripts/golden_real_scale.py --steps 30000 --update-golden
    python scripts/golden_real_scale.py --steps 30000      # verify
"""

import argparse
import glob
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# this environment's sitecustomize force-registers the axon TPU backend and
# overrides the JAX_PLATFORMS env var; only jax.config wins (see
# tests/conftest.py). LSENERF_PLATFORM=cpu lets smokes run off-chip.
if os.environ.get("LSENERF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LSENERF_PLATFORM"])

GOLDEN = osp.join(osp.dirname(osp.abspath(__file__)), "golden_parity.json")


def find_latest(pattern, root):
    hits = sorted(
        glob.glob(osp.join(root, "**", pattern), recursive=True),
        key=os.path.getmtime,
    )
    return hits[-1] if hits else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="outputs/golden_real")
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=96)
    ap.add_argument("--n-cams", type=int, default=200)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--update-golden", action="store_true")
    ap.add_argument("--no-golden", action="store_true",
                    help="smoke mode: never record or compare the golden")
    ap.add_argument("--skip-eval-protocol", action="store_true",
                    help="skip the 6010-step eval.sh stage")
    ap.add_argument("--emb", action="store_true",
                    help="LSENeRF_emb protocol: train with per-frame "
                    "appearance embeddings, then the TWO-stage emb_eval.sh "
                    "protocol (3010-step test-embedding pretrain + 6010-step "
                    "camera-opt eval) instead of the eval.sh stage")
    ap.add_argument("--golden-key", default=None,
                    help="golden_parity.json entry name (default: "
                    "real_scale, or real_scale_emb with --emb)")
    ap.add_argument("--evalsh-steps", type=int, default=6010,
                    help="camera-opt eval stage steps (eval.sh/emb_eval.sh)")
    ap.add_argument("--pretrain-steps", type=int, default=3010,
                    help="test-embedding pretrain stage steps (emb_eval.sh)")
    ap.add_argument("--tol-psnr", type=float, default=0.5)
    ap.add_argument("--tol-ssim", type=float, default=0.02)
    ap.add_argument("extra", nargs="*", help="extra train.py flags")
    # unknown --flags are extra train.py overrides (argparse would reject
    # them as positionals, e.g. occ_cadence_ab.sh's occ-sample-fraction)
    args, unknown = ap.parse_known_args(argv)
    args.extra = list(args.extra) + unknown

    from lsenerf_tpu.data.synthetic import write_reference_scene

    data = osp.join(args.workdir, "scene")
    if not osp.exists(osp.join(data, "colcam_set", "dataset.json")):
        t0 = time.perf_counter()
        write_reference_scene(
            data, n_cams=args.n_cams, h=args.height, w=args.width,
            focal=0.9 * args.width, n_val=4,
            with_prevnext=True, with_msk=True, with_full_camera=True,
            # high-frequency albedo so per-frame delta-log-gray is at real
            # event-data magnitude (~0.1-0.5); a smooth sphere at 1.35
            # deg/frame gives ~1e-3 and collapses the powpow exponent
            texture_freq=24.0,
        )
        print(f"[golden] wrote {args.n_cams}-frame {args.width}x{args.height} "
              f"scene in {time.perf_counter() - t0:.0f}s", flush=True)

    import train as train_mod

    run_root = osp.join(args.workdir, "run")
    # crash insurance for the flaky tunneled dev chip: save every 5k steps
    # and exact-resume (--load-checkpoint restores opt_state + rng) from the
    # newest checkpoint if a previous attempt died mid-run
    resume = []
    train_steps = args.steps
    latest_ckpt = find_latest("step-*", run_root)
    if latest_ckpt:
        # trainer resume follows nerfstudio semantics (max_num_iterations
        # MORE steps from the restored step), so shrink the budget to land
        # the total at args.steps
        # filename is the LAST COMPLETED step index (loop.py saves at
        # `last`/`end-1`), so loaded+1 steps are done and resume continues
        # at loaded+1. train_steps=0 is valid: train.py then runs the final
        # full eval directly (the absolute-step eval-all cadence at
        # args.steps can't re-fire inside an empty loop).
        loaded = int(osp.basename(latest_ckpt).rsplit("-", 1)[1])
        train_steps = max(0, args.steps - (loaded + 1))
        print(f"[golden] resuming from {latest_ckpt} "
              f"({train_steps} steps remain)", flush=True)
        resume = ["--load-checkpoint", latest_ckpt]
    t_train0 = time.perf_counter()
    train_mod.main([
        "lsenerf",
        "--data", data,
        "--output-dir", run_root,
        "--machine.seed", str(args.seed),
        "--max-num-iterations", str(train_steps),
        "--steps-per-save", str(min(5000, args.steps)),
    ] + resume + [
        "--steps-per-eval-image", str(args.steps // 3),
        "--steps-per-eval-all-images", str(args.steps),
        "--steps-per-eval-batch", str(args.steps // 3),
        "--pipeline.datamanager.rgb_frac", "0.66",
        # headline protocol (scripts/train_lse_data.sh)
        "--pipeline.model.rgb-loss-type", "deblur",
        "--pipeline.model.ev-one-dim", "gt",
        "--pipeline.model.use-mapping", "True",
        "--pipeline.model.mapping-method", "identity",
        "--pipeline.model.evs-mapping-method", "powpow",
        "--pipeline.model.map-mode", "co_map",
        "--pipeline.datamanager.col-cam-optimizer.mode", "SO3xR3",
        "--pipeline.datamanager.col-cam-optimizer.optim-type", "spline",
        "--pipeline.datamanager.col-cam-optimizer.exp-t", "30000",
        "--pipeline.datamanager.evs-cam-optimizer.mode", "SO3xR3",
    ] + (
        # LSENeRF_emb preset (configs/lsenerf_emb.sh): per-frame appearance
        # embeddings on the event rays
        ["--pipeline.model.embed-config.embedding-type", "evs_emb"]
        if args.emb else []
    ) + list(args.extra))
    t_train = time.perf_counter() - t_train0

    run_dir = osp.dirname(find_latest("config.yml", run_root))
    mean_f = find_latest("eval_mean.json", run_dir)
    assert mean_f, "training produced no eval_mean.json"
    with open(mean_f) as f:
        train_eval = json.load(f)
    print(f"[golden] train ({args.steps} steps, {t_train:.0f}s): "
          f"{json.dumps(train_eval)}", flush=True)

    eval_eval = None
    t_eval = None
    if not args.skip_eval_protocol and args.emb:
        # reference scripts/emb_eval.sh: stage 1 learns a single test
        # embedding on the frozen field (3010 steps, do_pretrain), stage 2
        # is the usual 6010-step camera-opt eval using it
        t0 = time.perf_counter()
        pre_root = osp.join(args.workdir, "emb_pretrain")
        train_mod.main([
            "lsenerf",
            "--max-num-iterations", str(args.pretrain_steps),
            "--steps-per-eval-image", "100000",
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--is_eval", "True",
            "--emb_eval_mode", "param",
            "--do_pretrain", "True",
            "--output-dir", pre_root,
            "--pipeline.model.eval-num-rays-per-chunk", "4096",
        ])
        pre_dir = osp.dirname(find_latest("config.yml", pre_root))
        eval_root = osp.join(args.workdir, "emb_eval_run")
        train_mod.main([
            "lsenerf",
            "--max-num-iterations", str(args.evalsh_steps),
            "--steps-per-eval-image", "100000",
            "--load-dir", osp.join(pre_dir, "checkpoints"),
            "--load-config", osp.join(pre_dir, "config.yml"),
            "--is_eval", "True",
            "--emb_eval_mode", "param",
            "--output-dir", eval_root,
            "--pipeline.model.eval-num-rays-per-chunk", "4096",
        ])
        t_eval = time.perf_counter() - t0
        ef = find_latest("eval_mean.json", eval_root)
        if ef:
            with open(ef) as f:
                eval_eval = json.load(f)
            print(f"[golden] emb_eval.sh protocol ({t_eval:.0f}s): "
                  f"{json.dumps(eval_eval)}", flush=True)
    elif not args.skip_eval_protocol:
        # reference scripts/eval.sh: 6010-step cam-opt on the frozen field
        eval_root = osp.join(args.workdir, "eval_run")
        t0 = time.perf_counter()
        train_mod.main([
            "lsenerf",
            "--max-num-iterations", str(args.evalsh_steps),
            "--steps-per-eval-image", "100000",
            "--load-dir", osp.join(run_dir, "checkpoints"),
            "--load-config", osp.join(run_dir, "config.yml"),
            "--is_eval", "True",
            "--emb_eval_mode", "zero",
            "--output-dir", eval_root,
            "--pipeline.model.eval-num-rays-per-chunk", "4096",
        ])
        t_eval = time.perf_counter() - t0
        ef = find_latest("eval_mean.json", eval_root)
        if ef:
            with open(ef) as f:
                eval_eval = json.load(f)
            print(f"[golden] eval.sh protocol ({t_eval:.0f}s): "
                  f"{json.dumps(eval_eval)}", flush=True)

    key = args.golden_key or ("real_scale_emb" if args.emb else "real_scale")
    config_name = (
        "deblur+spline+co_map+powpow+evs_emb (train_lse_data.sh lsenerf_emb)"
        if args.emb
        else "deblur+spline+co_map+powpow (train_lse_data.sh)"
    )
    if args.extra:
        # extra overrides change the protocol — record them
        config_name += " + " + " ".join(args.extra)
    entry = {
        "protocol": {
            "steps": args.steps, "seed": args.seed,
            "scene": f"{args.n_cams}x{args.width}x{args.height}"
                     "+prevnext+msk+full_camera",
            "config": config_name,
        },
        "train_wall_s": round(t_train, 1),
        "train_eval": train_eval,
    }
    if eval_eval is not None:
        entry["evalsh_wall_s"] = round(t_eval, 1)
        entry["evalsh_eval"] = eval_eval

    if args.no_golden:
        print("[golden] smoke mode: not recording/comparing")
        return 0

    golden = {}
    if osp.exists(GOLDEN):
        with open(GOLDEN) as f:
            golden = json.load(f)
    if args.update_golden or key not in golden:
        golden[key] = entry
        with open(GOLDEN, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"[golden] recorded {key} golden -> {GOLDEN}")
        return 0

    want = golden[key]
    src = want.get("evalsh_eval") or want["train_eval"]
    got = eval_eval or train_eval
    ok = True
    for k, tol in (("psnr", args.tol_psnr), ("ssim", args.tol_ssim)):
        if k in src and k in got:
            d = abs(got[k] - src[k])
            print(f"[golden] {k}: got {got[k]:.4f} want {src[k]:.4f} "
                  f"(|d|={d:.4f}, tol {tol})")
            ok &= d <= tol
    print("[golden] PASS" if ok else "[golden] FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
