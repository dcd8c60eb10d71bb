from sam_audio_tpu.train.flow_matching import (  # noqa: F401
    Trainer,
    flow_matching_loss,
    make_train_step,
)
from sam_audio_tpu.train.checkpoints import TrainCheckpointManager  # noqa: F401
from sam_audio_tpu.train.lora import (  # noqa: F401
    LoRATrainer,
    lora_init,
    lora_merge,
    merge_lora_checkpoint,
)
from sam_audio_tpu.train.records import (  # noqa: F401
    ShardedRecordDataset,
    ShardWriter,
    iter_batches,
    write_shards,
)
