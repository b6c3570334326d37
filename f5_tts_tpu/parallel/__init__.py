from f5_tts_tpu.parallel.mesh import (
    create_mesh,
    param_specs,
    state_specs,
    shard_params,
    shard_state,
    shard_train_step,
    shard_model_for_inference,
)

__all__ = [
    "create_mesh",
    "param_specs",
    "state_specs",
    "shard_params",
    "shard_state",
    "shard_train_step",
    "shard_model_for_inference",
]
