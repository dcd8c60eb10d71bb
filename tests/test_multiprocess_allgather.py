"""Real multi-process metric aggregation: two OS processes, a real
`jax.distributed` coordinator, and the REAL `multihost_utils.process_allgather`
collective (process_count == 2) — no injected fake.

The reference aggregates per-rank metric sums with NCCL `all_gather_object`
under torchrun (reference eval/main.py:19-42, 53-60); the semantics-parity
test (test_reference_eval_gather_parity.py) proves our math matches it with a
fake collective. This test closes the remaining gap: the genuine DCN-style
collective path in `gather_and_average_results(multihost=True)` with
jax.process_count() > 1, run here as two CPU-backend processes on one host.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Runs in a fresh interpreter: forces the CPU platform AFTER importing jax
# (the environment's sitecustomize overrides JAX_PLATFORMS), joins the
# two-process cluster, and aggregates rank-dependent rows. Rank r reports
# r+1 rows of {a: r+1, b: 2(r+1)} -> global sums a=5, b=10 over count=3.
_WORKER = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
sys.path.insert(0, {repo!r})
from sam_audio_tpu.eval.main import gather_and_average_results
rows = [{{"a": float(pid + 1), "b": 2.0 * (pid + 1)}}] * (pid + 1)
out = gather_and_average_results(rows, multihost=True)
assert jax.process_count() == 2, jax.process_count()
assert all(type(v) is float for v in out.values()), out
print("RESULT " + json.dumps(out))
""".format(repo=REPO_ROOT)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allgather_real_collective():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(rank), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=REPO_ROOT, env=env, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in: {out!r}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    # rank 0: one row {a:1, b:2}; rank 1: two rows {a:2, b:4} each
    # -> sum a = 1 + 4 = 5, b = 2 + 8 = 10, count = 3
    for res in results:
        assert abs(res["a"] - 5.0 / 3.0) < 1e-6, results
        assert abs(res["b"] - 10.0 / 3.0) < 1e-6, results
    # every rank returns the same global averages (reference semantics:
    # all_gather_object gives every rank the full set)
    assert results[0] == results[1]


def test_two_process_full_eval_loop(tmp_path):
    """The complete distributed eval flow across two real processes: each
    rank shards the 4-item synthetic setting (items 0,2 vs 1,3), runs
    separate() + Judge/Aesthetic/CLAP metric towers on its own local CPU
    device, and the averaged results merge all 4 items through the real
    process_allgather — the reference's torchrun eval (eval/main.py:53-60)
    end to end."""
    port = str(_free_port())
    out_dir = str(tmp_path)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    # 1 device per process, but keep fast compiles (2 workers, 2 CPUs)
    env["XLA_FLAGS"] = "--xla_backend_optimization_level=0"
    worker = os.path.join(REPO_ROOT, "tests", "eval_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), port, out_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=REPO_ROOT, env=env, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"eval worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in: {out!r}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    from test_eval import EXPECTED_METRIC_KEYS

    for res in results:
        assert set(res.keys()) == EXPECTED_METRIC_KEYS
        assert all(np.isfinite(v) for v in res.values()), res
    # both ranks observe the same global (4-item) averages
    assert results[0] == results[1]
    # rank 0 wrote the results file
    with open(os.path.join(out_dir, "synthetic.json")) as f:
        saved = json.load(f)
    assert set(saved.keys()) == EXPECTED_METRIC_KEYS
