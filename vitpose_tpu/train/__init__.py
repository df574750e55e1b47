from .optim import (layer_decay_adamw, make_lr_schedule, layer_id_for_path,
                    OptimConfig)
from .state import TrainState, create_train_state
from .step import make_train_step, make_moe_train_step, make_eval_step
