from sam_audio_tpu.models import dacvae, dit, sam_audio, t5  # noqa: F401
