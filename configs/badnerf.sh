# BADNeRF preset (reference exp_configs/BADNERF_config.sh):
# RGB-only, no mapping, global (= no) appearance embedding
rgb_frac=1.0
evs_loss_fn=log_loss
use_map=False
mapping_method=identity
map_mode=None
evs_mapping_method=None
exp_name=BADNeRF
emb_type=global_emb
