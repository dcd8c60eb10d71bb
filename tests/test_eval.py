"""End-to-end eval harness test on the hermetic synthetic setting: the full
loop (dataset -> separate -> Judge/Aesthetic/CLAP metrics -> aggregation ->
results json) with tiny random models."""

import json
import os

import jax
import numpy as np

from sam_audio_tpu.config import (
    DACVAEConfig,
    ModernBertTextConfig,
    PEAVTransformerConfig,
    SAMAudioJudgeConfig,
    tiny_test_config,
)
from sam_audio_tpu.eval.datasets import SyntheticBench
from sam_audio_tpu.eval.main import gather_and_average_results, run_eval
from sam_audio_tpu.eval.metrics import CLAP, Aesthetic, Judge
from sam_audio_tpu.models.aesthetics import AesPredictor, AestheticsConfig
from sam_audio_tpu.models.clap import ClapConfig, ClapModel
from sam_audio_tpu.models.judge import SAMAudioJudgeModel
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.processor import SAMAudioJudgeProcessor, SAMAudioProcessor
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer


def _tiny_judge():
    cfg = SAMAudioJudgeConfig(
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
    model = SAMAudioJudgeModel.init_random(jax.random.PRNGKey(0), cfg)
    proc = SAMAudioJudgeProcessor(
        audio_hop_length=8, audio_sampling_rate=8000,
        tokenizer=ByteFallbackTokenizer(300),
    )
    return model, proc


def _tiny_model_and_processor():
    cfg = tiny_test_config()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )
    processor = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
    )
    return model, processor


def _tiny_metrics():
    judge_model, judge_proc = _tiny_judge()
    return [
        Judge(model=judge_model, processor=judge_proc),
        Aesthetic(model=AesPredictor.init_random(
            jax.random.PRNGKey(1),
            AestheticsConfig(sample_rate=8000, n_fft=128, hop_length=64,
                             n_mels=16, hidden=16, layers=1, heads=2),
        )),
        CLAP(model=ClapModel.init_random(
            jax.random.PRNGKey(2),
            ClapConfig(sample_rate=8000, duration_s=0.25, n_fft=128,
                       hop_length=64, n_mels=16, fmin=10.0, fmax=4000.0,
                       spec_size=64, patch_size=4, audio_embed_dim=8,
                       depths=(1, 1), audio_heads=(2, 2), window_size=4,
                       text_vocab=300, text_hidden=16, text_layers=1,
                       text_heads=2, text_intermediate=24, max_text_len=16,
                       embed_dim=8),
            tokenizer=ByteFallbackTokenizer(300),
        )),
    ]


EXPECTED_METRIC_KEYS = {
    "JudgeOverall", "JudgeFaithfulness", "JudgeRecall", "JudgePrecision",
    "ContentEnjoyment", "ContentUsefulness", "ProductionComplexity",
    "ProductionQuality", "CLAPSimilarity",
}


def test_gather_and_average():
    rows = [{"a": 1.0, "b": 2.0}, {"a": 3.0, "b": 4.0}]
    avg = gather_and_average_results(rows)
    assert avg == {"a": 2.0, "b": 3.0}


def test_synthetic_dataset_items():
    cfg = tiny_test_config()
    p = SAMAudioProcessor(audio_hop_length=cfg.audio_codec.hop_length,
                          audio_sampling_rate=cfg.audio_codec.sample_rate)
    ds = SyntheticBench(collate_fn=p, span=True, num_items=3, seconds=0.05)
    assert len(ds) == 3
    item = ds[0]
    assert item.audio_samples.shape == (1, 400)  # 0.05s @ 8k
    batch = ds.collate([ds[0], ds[1]])
    assert batch.audios.shape[0] == 2
    assert batch.anchors is not None


def test_full_eval_loop_synthetic(tmp_path):
    model, processor = _tiny_model_and_processor()
    metrics = _tiny_metrics()
    out_dir = str(tmp_path / "results")
    results = run_eval(
        settings=["synthetic"], cache_path=str(tmp_path), batch_size=2,
        checkpoint_path="", reranking_candidates=1, model=model,
        processor=processor, metrics=metrics, output_dir=out_dir,
        max_items=2,
    )
    res = results["synthetic"]
    expected_keys = EXPECTED_METRIC_KEYS
    assert expected_keys == set(res.keys())
    assert all(np.isfinite(v) for v in res.values())
    with open(os.path.join(out_dir, "synthetic.json")) as f:
        saved = json.load(f)
    assert set(saved.keys()) == expected_keys


def test_settings_registry_matches_reference():
    from sam_audio_tpu.eval.settings import SETTINGS

    # the reference's 14 paper settings (eval/dataset/__init__.py:8-65)
    reference_settings = {
        "sfx", "speech", "speaker", "music", "instr-wild", "instr-pro",
        "sfx-span", "speech-span", "speaker-span", "music-span",
        "instr-wild-span", "sfx-visual", "speaker-visual", "instr-wild-visual",
    }
    assert reference_settings.issubset(set(SETTINGS.keys()))


def test_gather_and_average_multihost_simulated():
    """Simulated 3-process allgather: the returned mean must equal the global
    mean over every rank's rows (eval/main.py multihost path)."""
    from sam_audio_tpu.eval.main import gather_and_average_results

    rank_rows = [
        [{"a": 1.0, "b": 2.0}, {"a": 3.0, "b": 4.0}],   # rank 0 (local)
        [{"a": 5.0, "b": 6.0}],                           # rank 1
        [{"a": 7.0, "b": 8.0}, {"a": 9.0, "b": 10.0}],   # rank 2
    ]

    def fake_allgather(local):
        vecs = []
        for rows in rank_rows:
            s = {"a": 0.0, "b": 0.0}
            for r in rows:
                s["a"] += r["a"]
                s["b"] += r["b"]
            vecs.append([s["a"], s["b"], len(rows)])
        # every rank contributes its own vector; ours must match rank 0's
        np.testing.assert_allclose(local, vecs[0])
        return np.asarray(vecs, np.float64)

    res = gather_and_average_results(rank_rows[0], multihost=True,
                                     _allgather=fake_allgather)
    all_rows = [r for rows in rank_rows for r in rows]
    np.testing.assert_allclose(res["a"], np.mean([r["a"] for r in all_rows]))
    np.testing.assert_allclose(res["b"], np.mean([r["b"] for r in all_rows]))


def test_make_dataset_unknown_setting_lists_choices():
    import pytest

    from sam_audio_tpu.eval.settings import make_dataset

    with pytest.raises(KeyError, match="unknown eval setting"):
        make_dataset("not-a-setting", cache_path="/tmp", collate_fn=None)


def test_gather_handles_empty_rank_with_expected_keys():
    """A rank with zero items (world > dataset size) must contribute a
    same-shape vector to the collective: expected_keys pins the layout so
    the allgather cannot wedge on mismatched shapes."""
    rows_rank0 = [{"A": 1.0, "B": 3.0}, {"A": 3.0, "B": 5.0}]
    rows_rank1 = []  # empty shard
    vectors = []

    def fake_allgather(local):
        vectors.append(np.asarray(local))
        if len(vectors) == 1:  # simulate rank 1's contribution
            empty = gather_and_average_results(
                rows_rank1, multihost=True, expected_keys=["A", "B"],
                _allgather=lambda x: (vectors.append(np.asarray(x)),
                                      np.stack(vectors))[1])
            del empty
        return np.stack(vectors)

    avg = gather_and_average_results(rows_rank0, multihost=True,
                                     expected_keys=["A", "B"],
                                     _allgather=fake_allgather)
    assert {v.shape for v in vectors} == {(3,)}  # identical layouts
    assert avg == {"A": 2.0, "B": 4.0}  # count comes only from rank 0


def test_default_metrics_refuse_random_weights():
    """Eval metrics must never silently score with random init — the CLI
    would print meaningless CLAPSimilarity/CE/CU/PC/PQ as if real."""
    import pytest

    from sam_audio_tpu.eval.metrics import CLAP, Aesthetic, ImageBind

    for cls in (CLAP, Aesthetic, ImageBind):
        with pytest.raises(ValueError, match="random"):
            cls()
