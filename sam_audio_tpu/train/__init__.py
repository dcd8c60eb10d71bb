from sam_audio_tpu.train.flow_matching import (  # noqa: F401
    Trainer,
    flow_matching_loss,
    make_train_step,
)
