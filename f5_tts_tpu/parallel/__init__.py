from f5_tts_tpu.parallel.mesh import (
    create_mesh,
    param_specs,
    state_specs,
    shard_params,
    shard_state,
    shard_train_step,
    shard_model_for_inference,
)
from f5_tts_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    dit_forward_pipelined,
    shard_params_for_pipeline,
)

__all__ = [
    "create_mesh",
    "param_specs",
    "state_specs",
    "shard_params",
    "shard_state",
    "shard_train_step",
    "shard_model_for_inference",
    "create_pipeline_mesh",
    "dit_forward_pipelined",
    "shard_params_for_pipeline",
]
