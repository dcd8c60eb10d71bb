"""Distributed eval CLI (reference: eval/main.py:45-162).

  python -m sam_audio_tpu.eval.main -s <setting> -p <ckpt> -c 8

Data parallelism is per-process dataset sharding (jax.process_index /
process_count replace the reference's RANK/WORLD_SIZE + DistributedSampler);
per-rank metric sums are combined with multihost allgather over DCN (the
reference's all_gather_object, eval/main.py:19-42). Results land in
results/<setting>.json.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from sam_audio_tpu.eval.settings import SETTINGS, make_dataset


def gather_and_average_results(rows: List[Dict[str, float]],
                               multihost: bool = False,
                               _allgather=None,
                               expected_keys: Optional[List[str]] = None,
                               ) -> Dict[str, float]:
    """rows: list of per-item metric dicts. With multihost=True, per-rank
    {sum, count} vectors are allgathered over DCN and the global mean is
    returned on every process (reference eval/main.py:19-42 semantics, using
    jax process_allgather instead of NCCL all_gather_object). All ranks must
    compute the same metric key set — pass `expected_keys` (run_eval derives
    it from the metric objects) so a rank that processed ZERO items (world >
    dataset size) still contributes a vector of the right shape instead of
    wedging the collective. `_allgather` injects a fake collective for
    tests."""
    summed: Dict[str, float] = {}
    count = 0
    for row in rows:
        for k, v in row.items():
            summed[k] = summed.get(k, 0.0) + float(v)
        count += 1
    if multihost:
        if _allgather is None:
            from jax.experimental import multihost_utils

            def _allgather(local):
                return np.asarray(multihost_utils.process_allgather(local))

        keys = sorted(expected_keys) if expected_keys else sorted(summed)
        local = np.asarray([summed.get(k, 0.0) for k in keys] + [count],
                           np.float64)
        gathered = np.asarray(_allgather(local))
        assert gathered.ndim == 2 and gathered.shape[1] == len(keys) + 1, (
            "rank metric-vector shape mismatch — all ranks must report the "
            "same metric keys"
        )
        total = gathered.sum(axis=0)
        # cast numpy scalars back to Python floats: the real process_allgather
        # returns float32, and the documented Dict[str, float] contract (and
        # json.dumps on the result) breaks on numpy scalar types
        summed = {k: float(v) for k, v in zip(keys, total[:-1])}
        count = int(total[-1])
    return {k: v / max(count, 1) for k, v in summed.items()}


def _shard_indices(n: int, rank: int, world: int) -> List[int]:
    return list(range(rank, n, world))


def iter_batches(dset, batch_size: int, rank: int, world: int,
                 prefetch: int = 2):
    """Yields collated batches with background host prefetch: the next
    batch's decode/resample overlaps the current batch's TPU work (the
    reference gets this from DataLoader workers, eval/main.py:78-85)."""
    from concurrent.futures import ThreadPoolExecutor

    idxs = _shard_indices(len(dset), rank, world)
    chunks = [idxs[i : i + batch_size] for i in range(0, len(idxs), batch_size)]

    def load(chunk):
        return dset.collate([dset[j] for j in chunk])

    if prefetch <= 0 or len(chunks) <= 1:
        for chunk in chunks:
            yield load(chunk)
        return
    with ThreadPoolExecutor(max_workers=1) as pool:
        futures = [pool.submit(load, c) for c in chunks[:prefetch]]
        next_submit = prefetch
        for _ in range(len(chunks)):
            batch = futures.pop(0).result()
            if next_submit < len(chunks):
                futures.append(pool.submit(load, chunks[next_submit]))
                next_submit += 1
            yield batch


def run_eval(
    settings: List[str],
    cache_path: str,
    batch_size: int,
    checkpoint_path: str,
    reranking_candidates: int = 8,
    model=None,
    processor=None,
    metrics: Optional[List] = None,
    imagebind_metric=None,
    predict_spans: bool = False,
    output_dir: str = "results",
    max_items: Optional[int] = None,
    metric_checkpoints: Optional[Dict[str, str]] = None,
    allow_random_metrics: bool = False,
) -> Dict[str, Dict[str, float]]:
    import jax

    from sam_audio_tpu.models.sam_audio import SAMAudio
    from sam_audio_tpu.processor import SAMAudioProcessor

    rank = jax.process_index()
    world = jax.process_count()
    mck = metric_checkpoints or {}

    if model is None:
        model = SAMAudio.from_pretrained(checkpoint_path)
    if processor is None:
        processor = SAMAudioProcessor.from_pretrained(checkpoint_path)
    if metrics is None:
        from sam_audio_tpu.eval.metrics import CLAP, Aesthetic, Judge

        # no-weights metrics raise (scores with random init would print as
        # if real) unless allow_random_metrics is passed for hermetic runs
        metrics = [
            Judge(**({"checkpoint": mck["judge"]} if "judge" in mck else {})),
            Aesthetic(checkpoint=mck.get("aesthetic"),
                      allow_random=allow_random_metrics),
            CLAP(checkpoint=mck.get("clap"),
                 allow_random=allow_random_metrics),
        ]
    if imagebind_metric is None and any(
        SETTINGS[s][1].get("visual") for s in settings if s in SETTINGS
    ):
        from sam_audio_tpu.eval.metrics import ImageBind

        imagebind_metric = ImageBind(checkpoint=mck.get("imagebind"),
                                     allow_random=allow_random_metrics)

    all_results = {}
    for setting in settings:
        if rank == 0:
            print(f"Evaluating: {setting}")
        dset = make_dataset(setting, cache_path=cache_path,
                            collate_fn=processor)
        active_metrics = list(metrics)
        if dset.visual and imagebind_metric is not None:
            active_metrics.append(imagebind_metric)

        rows: List[Dict[str, float]] = []
        seen = 0
        for batch in iter_batches(dset, batch_size, rank, world):
            result = model.separate(
                batch, reranking_candidates=reranking_candidates,
                predict_spans=predict_spans,
            )
            input_wavs = [
                np.asarray(batch.audios)[i, 0, : int(batch.wav_sizes[i])]
                for i in range(batch.audios.shape[0])
            ]
            mets: Dict[str, List[float]] = {}
            for metric in active_metrics:
                mets.update(metric(
                    target_wavs=result.target,
                    target_wavs_sample_rate=model.sample_rate,
                    descriptions=batch.descriptions,
                    input_wavs=input_wavs,
                    videos=batch.masked_video,
                ))
            n_items = len(result.target)
            for i in range(n_items):
                rows.append({k: v[i] for k, v in mets.items()})
            seen += n_items
            if max_items is not None and seen >= max_items:
                break

        expected = sorted({
            k for m in active_metrics for k in getattr(m, "keys", ())
        }) or None
        averaged = gather_and_average_results(rows, multihost=world > 1,
                                              expected_keys=expected)
        all_results[setting] = averaged
        if rank == 0:
            printable = {k: f"{v:.3f}" for k, v in averaged.items()}
            print(json.dumps(printable, indent=4))
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, f"{setting}.json"), "w") as fout:
                print(json.dumps(printable), file=fout)
    return all_results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--setting", "-s", choices=SETTINGS.keys(),
                        default=["instr-pro"], nargs="+")
    parser.add_argument("--cache-path", type=str,
                        default=os.path.expanduser("~/.cache/sam_audio"))
    parser.add_argument("--checkpoint-path", "-p", type=str,
                        default="facebook/sam-audio-large")
    parser.add_argument("--batch-size", "-b", type=int, default=1)
    parser.add_argument("--candidates", "-c", type=int, default=8)
    parser.add_argument("--predict-spans", action="store_true")
    parser.add_argument("--max-items", type=int, default=None)
    parser.add_argument("--judge-checkpoint", default=None,
                        help="judge metric snapshot (default: HF repo)")
    parser.add_argument("--aes-checkpoint", default=None,
                        help="audiobox-aesthetics weights (.pt or converted)")
    parser.add_argument("--clap-checkpoint", default=None,
                        help="converted laion_clap weights (npz)")
    parser.add_argument("--imagebind-checkpoint", default=None,
                        help="converted imagebind_huge weights (npz)")
    parser.add_argument("--allow-random-metrics", action="store_true",
                        help="hermetic/dev runs only: score with random "
                             "metric weights (numbers are meaningless)")
    opt = parser.parse_args()
    mck = {k: v for k, v in (("judge", opt.judge_checkpoint),
                             ("aesthetic", opt.aes_checkpoint),
                             ("clap", opt.clap_checkpoint),
                             ("imagebind", opt.imagebind_checkpoint))
           if v}
    run_eval(
        settings=opt.setting,
        cache_path=opt.cache_path,
        batch_size=opt.batch_size,
        checkpoint_path=opt.checkpoint_path,
        reranking_candidates=opt.candidates,
        predict_spans=opt.predict_spans,
        max_items=opt.max_items,
        metric_checkpoints=mck,
        allow_random_metrics=opt.allow_random_metrics,
    )


if __name__ == "__main__":
    main()
