from artiboost_tpu.parallel.mesh import get_mesh, shard_batch  # noqa: F401
from artiboost_tpu.parallel.train_state import (  # noqa: F401
    TrainState,
    build_optimizer,
    build_scheduler,
    create_train_state,
    make_eval_step,
    make_fused_train_step,
    make_mixed_train_step,
    make_train_step,
)
