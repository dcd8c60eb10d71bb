"""Worker process for the two-process distributed eval test.

Spawned (not imported) by tests/test_multiprocess_allgather.py: joins a real
two-process `jax.distributed` cluster on the CPU backend, builds the same
tiny hermetic models as test_eval.py, and runs the FULL `run_eval` loop on
the synthetic setting — per-process dataset sharding, separate(), the three
metric towers, and the REAL `process_allgather` aggregation (the reference's
torchrun + NCCL all_gather_object flow, reference eval/main.py:53-60, 19-42).

Usage: python eval_mp_worker.py <rank> <coordinator_port> <out_dir>
Prints one line: `RESULT <json of the averaged synthetic metrics>`.
"""

import json
import os
import sys

import jax

# The environment's sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS; jax.config after import is the working override.
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    rank, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    # jit defaults to jax.devices()[0], which on rank 1 is rank 0's
    # (non-addressable) device; pin each process to its own local device so
    # all per-rank compute stays local and only the allgather crosses.
    jax.config.update("jax_default_device", jax.local_devices()[0])

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root for sam_audio_tpu
    from test_eval import _tiny_metrics, _tiny_model_and_processor

    from sam_audio_tpu.eval.main import run_eval

    model, processor = _tiny_model_and_processor()
    results = run_eval(
        settings=["synthetic"], cache_path=out_dir, batch_size=1,
        checkpoint_path="", reranking_candidates=1, model=model,
        processor=processor, metrics=_tiny_metrics(), output_dir=out_dir,
        max_items=2,
    )
    print("RESULT " + json.dumps(results["synthetic"]), flush=True)


if __name__ == "__main__":
    main()
