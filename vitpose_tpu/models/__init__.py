from .vit import ViT, ViTConfig, VIT_VARIANTS, Block, Attention, Mlp, MoEMlp
from .heads import HeatmapHead, SimpleHead
from .losses import (joints_mse_loss, combined_target_mse_loss,
                     joints_ohkm_mse_loss)
from .topdown import (TopDownConfig, TopDownModel, make_config, forward,
                      infer, loss_fn)
