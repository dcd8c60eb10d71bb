"""Hermetic proof of scripts/validate_real_checkpoint.py: build a
reference-shaped checkpoint.pt (the exact published key set, random
weights) and require the full validator — reference source on the torch
side, load_sam_audio on ours — to report PASS on every gate."""

import importlib.util
import json
import os

import torch

from test_full_checkpoint_e2e import COMMON, _reference_shaped_checkpoint

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "validate_real_checkpoint.py")


def _load_script():
    spec = importlib.util.spec_from_file_location("validate_real_ckpt",
                                                  _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_validator_passes_on_reference_shaped_checkpoint(tmp_path, capsys):
    sd = _reference_shaped_checkpoint()
    torch.save(sd, tmp_path / "checkpoint.pt")
    cfg = dict(COMMON)
    cfg["compute_dtype"] = "float32"
    # tiny JAX-side T5 arch for gate E's shared local text tower (the
    # reference side only reads `dim` from this dict, config.py:49-60)
    cfg["text_encoder"] = dict(dim=16, num_layers=2, num_heads=4, head_dim=4,
                               d_ff=32, vocab_size=128,
                               relative_attention_num_buckets=8,
                               relative_attention_max_distance=16,
                               max_length=16)
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    mod = _load_script()
    rc = mod.main(str(tmp_path), tol=1e-3)
    out = capsys.readouterr().out
    assert "VALIDATION PASS" in out, out
    assert rc == 0
    # every gate reported
    for gate in ("A_velocity_field", "B_ode_32nfe", "C_codec_encode",
                 "D_codec_decode_waveform", "E_full_separate_waveform"):
        assert gate in out, out


def test_validator_not_vacuously_green(tmp_path, capsys):
    """Negative control: both sides read the same file, so squeeze the
    tolerance below fp32 numerics — the validator must report FAIL and
    exit nonzero, proving the gates actually compare real values."""
    sd = _reference_shaped_checkpoint()
    torch.save(sd, tmp_path / "checkpoint.pt")
    cfg = dict(COMMON)
    cfg["compute_dtype"] = "float32"
    # tiny JAX-side T5 arch for gate E's shared local text tower (the
    # reference side only reads `dim` from this dict, config.py:49-60)
    cfg["text_encoder"] = dict(dim=16, num_layers=2, num_heads=4, head_dim=4,
                               d_ff=32, vocab_size=128,
                               relative_attention_num_buckets=8,
                               relative_attention_max_distance=16,
                               max_length=16)
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    mod = _load_script()
    rc = mod.main(str(tmp_path), tol=1e-12)
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out
