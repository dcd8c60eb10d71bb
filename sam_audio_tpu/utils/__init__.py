from sam_audio_tpu.utils.profiling import StageTimer, trace  # noqa: F401
from sam_audio_tpu.utils.map_guard import maybe_clear_caches  # noqa: F401
