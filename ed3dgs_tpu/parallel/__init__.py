from .mesh import make_mesh  # noqa: F401
from .sharded import make_sharded_train_step, shard_batch, shard_train_state  # noqa: F401
