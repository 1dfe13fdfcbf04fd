# BADNeRF_emb preset (reference exp_configs/BADNERF_emb_config.sh):
# RGB-only with per-frame appearance embeddings
rgb_frac=1.0
evs_loss_fn=log_loss
use_map=False
mapping_method=identity
map_mode=None
evs_mapping_method=None
exp_name=BADNeRF_emb
emb_type=evs_emb
