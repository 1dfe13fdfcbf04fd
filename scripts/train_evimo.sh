#!/bin/bash
# Train driver for EVIMOv2 scenes
# (parity with reference scripts/train_evimo.sh).
# Usage: scripts/train_evimo.sh <data_dir> [preset=badnerf]
set -e
DATA="${1:?usage: train_evimo.sh <data_dir> [preset=badnerf]}"
PRESET="${2:-badnerf}"
source "$(dirname "$0")/../configs/${PRESET}.sh"

seed=96
MAX_NUM_ITER=200010
OUTPUT_DIR=outputs_tpu

rgb_loss_fn=deblur
evs_w=1.0
col_cam_opt=SO3xR3
evs_cam_opt=SO3xR3
col_cam_opt_type=spline
evs_cam_opt_type=ns
ev_one=gt
scale_fac=1.0   # reference scripts/train_evimo.sh:32 (EVIMOv2 scenes)
scene_scale=1.0

python train.py lsenerf --data "$DATA" \
    --method-name "$exp_name" \
    --output-dir "$OUTPUT_DIR" \
    --pipeline.datamanager.evs-dataparser.scale-factor $scale_fac \
    --pipeline.datamanager.col-dataparser.scale-factor $scale_fac \
    --pipeline.datamanager.evs-dataparser.scene-scale $scene_scale \
    --pipeline.datamanager.col-dataparser.scene-scale $scene_scale \
    --pipeline.datamanager.col-cam-optimizer.mode $col_cam_opt \
    --pipeline.datamanager.evs-cam-optimizer.mode $evs_cam_opt \
    --pipeline.datamanager.col-cam-optimizer.optim-type $col_cam_opt_type \
    --pipeline.datamanager.col-cam-optimizer.exp-t 30000 \
    --pipeline.datamanager.evs-cam-optimizer.optim-type $evs_cam_opt_type \
    --max-num-iterations $MAX_NUM_ITER \
    --steps-per-eval-image 20000 \
    --steps-per-save 10000 \
    --steps-per-eval-all-images 100000 \
    --pipeline.datamanager.rgb_frac $rgb_frac \
    --optimizers.fields.optimizer.lr 1e-2 \
    --pipeline.model.evs-loss-weight $evs_w \
    --pipeline.model.event-loss-type $evs_loss_fn \
    --pipeline.model.rgb-loss-type $rgb_loss_fn \
    --pipeline.model.ev-one-dim $ev_one \
    --pipeline.model.use-mapping $use_map \
    --pipeline.model.mapping-method $mapping_method \
    --pipeline.model.evs-mapping-method $evs_mapping_method \
    --pipeline.model.map-mode $map_mode \
    --pipeline.model.embed-config.embedding-type $emb_type \
    --machine.seed $seed
