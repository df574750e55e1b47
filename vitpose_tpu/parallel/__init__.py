from .mesh import (make_mesh, param_shardings, batch_shardings,
                   shard_state, shard_train_step, replicate)
