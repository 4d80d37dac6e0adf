from artiboost_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    init_distributed,
    put_global,
    shard_batch,
)
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
