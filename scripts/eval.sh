#!/bin/bash
# Post-hoc eval: 6010-step camera-pose refinement on the frozen NeRF, then
# full-image eval (parity with reference scripts/eval.sh).
# Usage: scripts/eval.sh <run_dir>   (the dir containing config.yml + checkpoints/)
set -e
EXP_PATH="${1:?usage: eval.sh <run_dir>}"

python train.py lsenerf \
    --max-num-iterations $((6000 + 10)) \
    --steps-per-eval-image 10000 \
    --load-dir "$EXP_PATH/checkpoints" \
    --load-config "$EXP_PATH/config.yml" \
    --is_eval True \
    --emb_eval_mode zero \
    --pipeline.datamanager.col-dataparser.image-type clear \
    --pipeline.datamanager.col-dataparser.quality "" \
    --pipeline.model.eval-num-rays-per-chunk 4096
