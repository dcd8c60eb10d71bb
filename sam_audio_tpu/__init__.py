"""sam_audio_tpu: TPU-native promptable audio source separation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
facebookresearch/sam-audio: text-, visual-, and span-prompted separation of
a target sound from a mixture via conditional flow matching in a DAC-VAE
latent space, with k-candidate generation and reranking.

Quick start:

    from sam_audio_tpu import SAMAudio, SAMAudioProcessor

    model = SAMAudio.from_pretrained("facebook/sam-audio-large")
    processor = SAMAudioProcessor.from_pretrained("facebook/sam-audio-large")
    batch = processor(descriptions=["A dog barking"], audios=["mix.wav"])
    result = model.separate(batch, reranking_candidates=8)
"""

from sam_audio_tpu.config import (  # noqa: F401
    DACVAEConfig,
    SAMAudioConfig,
    SAMAudioJudgeConfig,
    T5EncoderConfig,
    TransformerConfig,
    parse_ranker_config,
)
from sam_audio_tpu.models.sam_audio import (  # noqa: F401
    SAMAudio,
    SeparationResult,
)
from sam_audio_tpu.processor import (  # noqa: F401
    Batch,
    SAMAudioJudgeProcessor,
    SAMAudioProcessor,
)


def __getattr__(name):
    # lazy: the judge pulls in the full tower stack
    if name == "SAMAudioJudgeModel":
        from sam_audio_tpu.models.judge import SAMAudioJudgeModel

        return SAMAudioJudgeModel
    # lazy: serving entry points (offline pipeline, online batcher/server)
    if name in ("SeparationPipeline", "SeparationRequest",
                "SeparationResponse"):
        import sam_audio_tpu.serving as _serving

        return getattr(_serving, name)
    if name in ("ContinuousBatcher", "SeparationServer"):
        import sam_audio_tpu.server as _server

        return getattr(_server, name)
    raise AttributeError(name)

__version__ = "0.1.0"
