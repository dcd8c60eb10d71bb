from sam_audio_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)
