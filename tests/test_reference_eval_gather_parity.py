"""Metric-aggregation parity against the real reference eval/main.py:
gather_and_average_results must produce the same global means as the
reference's pandas + all_gather_object implementation (eval/main.py:19-42),
both single-process and simulated multi-rank."""

import importlib.util
import sys
import types

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
torch = pytest.importorskip("torch")

from sam_audio_tpu.eval.main import gather_and_average_results


def _load_reference_eval_main(monkeypatch, fake_gathered):
    """Execute the real eval/main.py with torch.distributed's
    all_gather_object replaced by a playback of `fake_gathered` and the
    heavy sam_audio imports stubbed (only gather_and_average_results runs).
    All sys.modules edits are scoped to the test via monkeypatch."""
    from reference_loader import load_reference

    load_reference()
    # eval/main.py's module-level imports: the public sam_audio surface plus
    # its sibling `dataset`/`metrics` packages — none used by the function
    # under test. `dataset`/`metrics` are generic top-level names ("metrics"
    # is a real PyPI package), so never install them permanently.
    monkeypatch.setattr(sys.modules["sam_audio"], "SAMAudio", object,
                        raising=False)
    monkeypatch.setattr(sys.modules["sam_audio"], "SAMAudioProcessor",
                        object, raising=False)
    dataset_pkg = types.ModuleType("dataset")
    dataset_pkg.SETTINGS = {}
    dataset_pkg.make_dataset = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "dataset", dataset_pkg)
    metrics_pkg = types.ModuleType("metrics")
    for cls in ("Judge", "Aesthetic", "CLAP", "ImageBind"):
        setattr(metrics_pkg, cls, object)
    monkeypatch.setitem(sys.modules, "metrics", metrics_pkg)

    spec = importlib.util.spec_from_file_location(
        "ref_eval_main", "/root/reference/eval/main.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # replace torch.distributed with a playback of the gathered objects
    mod.dist = types.SimpleNamespace(
        all_gather_object=lambda out, local: out.__setitem__(
            slice(None), fake_gathered),
        init_process_group=lambda *a, **k: None,
    )
    return mod


def _rows(rank, n=4):
    rng = np.random.RandomState(10 + rank)
    return [
        {"JudgeOverall": float(rng.rand()), "CLAPSimilarity": float(rng.rand())}
        for _ in range(n)
    ]


def test_single_process_mean_matches_reference(monkeypatch):
    rows = _rows(0)
    mod = _load_reference_eval_main(monkeypatch, fake_gathered=[])
    want = mod.gather_and_average_results(pd.DataFrame(rows), world_size=1)
    got = gather_and_average_results(rows, multihost=False)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9)


def test_multirank_aggregation_matches_reference(monkeypatch):
    per_rank = [_rows(r, n=3 + r) for r in range(3)]
    gathered = [
        {"sum": pd.DataFrame(rows).sum().to_json(), "count": len(rows)}
        for rows in per_rank
    ]
    mod = _load_reference_eval_main(monkeypatch, fake_gathered=gathered)
    want = mod.gather_and_average_results(pd.DataFrame(per_rank[0]),
                                          world_size=3)

    # ours: simulate the allgather of per-rank [sums..., count] vectors
    def fake_allgather(local):
        out = []
        for rows in per_rank:
            keys = sorted(rows[0])
            s = {k: sum(r[k] for r in rows) for k in keys}
            out.append([s[k] for k in keys] + [len(rows)])
        return np.asarray(out, np.float64)

    got = gather_and_average_results(per_rank[0], multihost=True,
                                     _allgather=fake_allgather)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9)
