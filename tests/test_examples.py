"""The examples/ walkthroughs are the documented user surface (the
reference's only smoke tests are its notebook examples, SURVEY.md §4) —
run each one end-to-end in-process so API drift breaks the suite, not a
user's first session.

Each example's main() is imported and driven with a patched argv into a
tmp dir; the demo models are small (the examples default to small
randomly-initialized nets precisely so they run in seconds on CPU).
"""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(EXAMPLES_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(name, tmp_path, monkeypatch, extra=()):
    mod = _load(name)
    monkeypatch.setattr(
        sys, "argv", [f"{name}.py", "--out", str(tmp_path), *extra])
    mod.main()


def test_span_prompting_example(tmp_path, monkeypatch):
    _run("span_prompting", tmp_path, monkeypatch)
    for f in ("mixture.wav", "target_text.wav", "residual_text.wav",
              "target_span.wav", "target_predicted.wav"):
        assert (tmp_path / f).stat().st_size > 44, f  # WAV header + audio


def test_visual_prompting_example(tmp_path, monkeypatch):
    _run("visual_prompting", tmp_path, monkeypatch)
    for f in ("mixture.wav", "target_visual.wav", "target_reranked.wav",
              "target_strided.wav"):
        assert (tmp_path / f).stat().st_size > 44, f


def test_train_flow_matching_example(tmp_path, monkeypatch):
    _run("train_flow_matching", tmp_path, monkeypatch,
         extra=("--steps", "3", "--batch-size", "2"))
    ckpts = os.listdir(tmp_path / "ckpt")
    assert ckpts, "rolling checkpoint directory is empty"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
