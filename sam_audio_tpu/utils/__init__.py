from sam_audio_tpu.utils.profiling import StageTimer, trace  # noqa: F401
