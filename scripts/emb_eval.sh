#!/bin/bash
# Two-stage embedding eval for *_emb methods (parity with reference
# scripts/emb_eval.sh): stage 1 fits a test embedding (3010 steps, frozen
# field), stage 2 runs the usual camera-opt eval with it.
# Usage: scripts/emb_eval.sh <run_dir>
set -e
EXP_PATH="${1:?usage: emb_eval.sh <run_dir>}"

python train.py lsenerf \
    --max-num-iterations 3010 \
    --steps-per-eval-image 10000 \
    --load-dir "$EXP_PATH/checkpoints" \
    --load-config "$EXP_PATH/config.yml" \
    --is_eval True \
    --emb_eval_mode param \
    --do_pretrain True \
    --pipeline.datamanager.col-dataparser.image-type clear \
    --pipeline.datamanager.col-dataparser.quality "" \
    --pipeline.model.eval-num-rays-per-chunk 2048

PARAM_EXP_PATH="${EXP_PATH}_eval_param"
LAST_DIR=$(ls -1 "$PARAM_EXP_PATH" | grep -v '_eval_param' | sort | tail -n 1)
FULL_DIR="$PARAM_EXP_PATH/$LAST_DIR"

python train.py lsenerf \
    --max-num-iterations $((6000 + 10)) \
    --steps-per-eval-image 10000 \
    --is_eval True \
    --emb_eval_mode param \
    --pipeline.datamanager.col-dataparser.image-type clear \
    --pipeline.datamanager.col-dataparser.quality "" \
    --load-dir "$FULL_DIR/checkpoints" \
    --load-config "$FULL_DIR/config.yml" \
    --pipeline.model.eval-num-rays-per-chunk 2048
