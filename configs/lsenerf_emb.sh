# LSENeRF_emb preset (reference exp_configs/lsenerf_emb_config.sh)
rgb_frac=0.66
evs_loss_fn=log_loss
use_map=True
mapping_method=identity
map_mode=co_map
evs_mapping_method=powpow
exp_name=LSENeRF_emb
emb_type=evs_emb
