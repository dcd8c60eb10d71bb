"""End-to-end test of the command-line entry point (separate_cli).

The CLI is the user-facing equivalent of the reference's
`SAMAudio.from_pretrained(...)` + `processor(...)` + `model.separate(...)`
snippet (reference README.md quickstart); this drives it hermetically on a
tiny random snapshot: load from a snapshot dir, read a wav from disk,
separate (direct and streaming windows), and write target/residual wavs.
"""

import json

import jax
import numpy as np
import pytest

from sam_audio_tpu.audio_io import load_audio, write_wav
from sam_audio_tpu.checkpoint import save_params
from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import sam_audio_init
from sam_audio_tpu.separate_cli import main as cli_main

@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    import dataclasses

    snap = tmp_path_factory.mktemp("cli_snapshot")
    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    save_params(str(snap / "params.npz"), params)
    with open(snap / "config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    return str(snap)


@pytest.fixture()
def mixture_wav(tmp_path):
    sr = 8000
    t = np.arange(int(0.05 * sr)) / sr  # 400 samples -> 50 latent frames
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "mixture.wav")
    write_wav(path, wav, sr)
    return path, wav.shape[-1], sr


def test_cli_direct_writes_outputs(snapshot_dir, mixture_wav, tmp_path):
    path, n, sr = mixture_wav
    out = str(tmp_path / "out")
    cli_main(["--allow-random-towers",  # hermetic random snapshot
              "-p", snapshot_dir, "-i", path, "-d", "a test tone",
              "-o", out, "--seed", "3"])
    tgt, tsr = load_audio(out + "/target.wav")
    res, _ = load_audio(out + "/residual.wav")
    assert tsr == sr
    assert tgt.shape[-1] == n and res.shape[-1] == n
    assert np.all(np.isfinite(tgt)) and np.all(np.isfinite(res))


def test_cli_spans_and_candidates(snapshot_dir, mixture_wav, tmp_path):
    path, n, _ = mixture_wav
    out = str(tmp_path / "out_spans")
    # -c 2 without a ranker configured falls back to candidate 0 (the
    # reference needs a text_ranker for k>1; separate() handles has_ranker
    # False by picking index 0) and --spans adds a "+" anchor
    cli_main(["--allow-random-towers",  # hermetic random snapshot
              "-p", snapshot_dir, "-i", path, "-d", "a test tone",
              "-o", out, "-c", "2", "--spans", "0.01", "0.03"])
    tgt, _ = load_audio(out + "/target.wav")
    assert tgt.shape[-1] == n


def test_hub_reachable_honors_offline_env(monkeypatch):
    # the fast pre-check that keeps air-gapped hosts from paying HF's
    # ~40 s/file retry backoff before hermetic fallbacks engage.
    # huggingface_hub accepts several truthy spellings — honor them all, or
    # an HF_HUB_OFFLINE=true host would probe reachable and then crash in
    # OfflineModeIsEnabled instead of using its local cache.
    from sam_audio_tpu.text_tokenizer import hub_reachable

    for spelling in ("1", "true", "TRUE", "yes", "on"):
        monkeypatch.setenv("HF_HUB_OFFLINE", spelling)
        assert hub_reachable() is False, spelling
    monkeypatch.delenv("HF_HUB_OFFLINE")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "true")
    assert hub_reachable() is False


def test_roberta_partial_staging_falls_through_gate(monkeypatch, tmp_path):
    """A half-staged tokenizer dir (vocab.json, no merges.txt) must fall
    through to the allow_fallback policy, not crash outside it."""
    import json as _json

    from sam_audio_tpu.text_tokenizer import (
        RobertaBPETokenizer,
        get_roberta_tokenizer,
    )

    (tmp_path / "vocab.json").write_text(_json.dumps({"a": 0}))
    monkeypatch.setenv("SAM_AUDIO_ROBERTA_TOKENIZER", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    tok = get_roberta_tokenizer(allow_fallback=True)
    # served by HF cache or byte fallback — never the incomplete dir
    assert not isinstance(tok, RobertaBPETokenizer)
    ids, mask = tok(["hello"], max_length=16)
    assert ids.shape[0] == 1 and mask.shape == ids.shape


def test_cli_streaming_windows(snapshot_dir, mixture_wav, tmp_path):
    path, n, _ = mixture_wav
    out = str(tmp_path / "out_stream")
    cli_main(["--allow-random-towers",  # hermetic random snapshot
              "-p", snapshot_dir, "-i", path, "-d", "a test tone",
              "-o", out, "--window-s", "0.03", "--batch-windows", "2"])
    tgt, _ = load_audio(out + "/target.wav")
    res, _ = load_audio(out + "/residual.wav")
    assert tgt.shape[-1] == n and res.shape[-1] == n
    assert np.all(np.isfinite(tgt))
