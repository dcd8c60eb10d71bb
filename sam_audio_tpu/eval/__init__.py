from sam_audio_tpu.eval.settings import SETTINGS, make_dataset  # noqa: F401
