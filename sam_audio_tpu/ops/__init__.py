from sam_audio_tpu.ops import attention, conv, nn, ode, resample, rope  # noqa: F401
