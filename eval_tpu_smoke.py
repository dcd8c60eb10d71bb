"""Run the full eval harness (synthetic setting, all metrics) on the real
TPU chip — hardware validation of layer L6 (same wiring as
tests/test_eval.py::test_full_eval_loop_synthetic, which runs on CPU)."""

import tempfile

import jax
import numpy as np

from sam_audio_tpu.config import (
    DACVAEConfig,
    ModernBertTextConfig,
    PEAVTransformerConfig,
    SAMAudioJudgeConfig,
    tiny_test_config,
)
from sam_audio_tpu.eval.main import run_eval
from sam_audio_tpu.eval.metrics import CLAP, Aesthetic, Judge
from sam_audio_tpu.models.aesthetics import AesPredictor, AestheticsConfig
from sam_audio_tpu.models.clap import ClapConfig, ClapModel
from sam_audio_tpu.models.judge import SAMAudioJudgeModel
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioJudgeProcessor, SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer


def main():
    print("devices:", jax.devices())
    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    processor = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    jcfg = SAMAudioJudgeConfig(
        audio_codec=DACVAEConfig(encoder_dim=4, encoder_rates=(2, 4),
                                 latent_dim=16, decoder_dim=16,
                                 decoder_rates=(4, 2), codebook_dim=4,
                                 sample_rate=8000),
        transformer=PEAVTransformerConfig(hidden_size=16, num_layers=1,
                                          num_heads=2),
        finetune_transformer=PEAVTransformerConfig(hidden_size=12,
                                                   num_layers=1, num_heads=2),
        text_model=ModernBertTextConfig(
            vocab_size=300, hidden_size=16, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=24,
            global_attn_every_n_layers=3, local_attention=8,
        ),
        nth_text_layer=2, bottleneck_dim=8, compute_dtype="float32",
    )
    metrics = [
        Judge(model=SAMAudioJudgeModel.init_random(jax.random.PRNGKey(0), jcfg),
              processor=SAMAudioJudgeProcessor(
                  audio_hop_length=8, audio_sampling_rate=8000,
                  tokenizer=ByteFallbackTokenizer(300))),
        Aesthetic(model=AesPredictor.init_random(
            jax.random.PRNGKey(1),
            AestheticsConfig(sample_rate=8000, n_fft=128, hop_length=64,
                             n_mels=16, hidden=16, layers=1, heads=2))),
        CLAP(model=ClapModel.init_random(
            jax.random.PRNGKey(2),
            ClapConfig(sample_rate=8000, duration_s=0.25, n_fft=128,
                       hop_length=64, n_mels=16, fmin=10.0, fmax=4000.0,
                       spec_size=64, patch_size=4, audio_embed_dim=8,
                       depths=(1, 1), audio_heads=(2, 2), window_size=4,
                       text_vocab=300, text_hidden=16, text_layers=1,
                       text_heads=2, text_intermediate=24, max_text_len=16,
                       embed_dim=8),
            tokenizer=ByteFallbackTokenizer(300))),
    ]
    tmp = tempfile.mkdtemp(prefix="eval_smoke_")
    results = run_eval(
        settings=["synthetic"], cache_path=tmp, batch_size=2,
        checkpoint_path="", reranking_candidates=2, model=model,
        processor=processor, metrics=metrics, output_dir=tmp + "/results",
        max_items=2,
    )
    res = results["synthetic"]
    assert all(np.isfinite(v) for v in res.values()), res
    print("EVAL TPU SMOKE PASS:", sorted(res))


if __name__ == "__main__":
    main()
