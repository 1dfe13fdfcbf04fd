# LSENeRF preset (reference exp_configs/lsenerf_config.sh):
# joint RGB+event training, co_map with learnable-gamma event mapper
rgb_frac=0.66
evs_loss_fn=log_loss
use_map=True
mapping_method=identity
map_mode=co_map
evs_mapping_method=powpow
exp_name=LSENeRF
emb_type=global_emb
