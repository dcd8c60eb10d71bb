from sam_audio_tpu.ops import (  # noqa: F401
    attention,
    conv,
    mel,
    nn,
    ode,
    resample,
    rope,
)
