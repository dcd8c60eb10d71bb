"""Sharded training records (train/records.py) and checkpoint retention
(train/checkpoints.py)."""

import numpy as np
import pytest

from sam_audio_tpu.train.data import TrainExample
from sam_audio_tpu.train.records import (
    ShardedRecordDataset,
    iter_batches,
    write_shards,
)


def _examples(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        t = 50 + 10 * (i % 4)
        mix = rng.randn(t).astype(np.float32)
        tgt = rng.randn(t).astype(np.float32)
        anchors = [("+", 0.1 * i, 0.1 * i + 0.5)] if i % 3 == 0 else None
        out.append(TrainExample(
            mixture=mix, target=tgt, residual=mix - tgt,
            description=f"example {i} — café", anchors=anchors,
        ))
    return out


def test_roundtrip_preserves_examples(tmp_path):
    exs = _examples(10)
    write_shards(exs, str(tmp_path), shard_size=4)  # 3 shards: 4+4+2
    ds = ShardedRecordDataset(str(tmp_path), shuffle=False)
    assert len(ds) == 10
    got = sorted(ds, key=lambda e: e.description)
    want = sorted(exs, key=lambda e: e.description)
    for g, w in zip(got, want):
        assert g.description == w.description
        np.testing.assert_array_equal(g.mixture, np.ravel(w.mixture))
        np.testing.assert_array_equal(g.target, np.ravel(w.target))
        np.testing.assert_array_equal(g.residual, np.ravel(w.residual))
        assert g.anchors == w.anchors


def test_process_sharding_is_disjoint_and_complete(tmp_path):
    write_shards(_examples(20), str(tmp_path), shard_size=3)  # 7 shards
    seen = []
    for rank in range(3):
        ds = ShardedRecordDataset(str(tmp_path), process_index=rank,
                                  process_count=3, seed=5)
        seen.append({e.description for e in ds.epoch(2)})
    assert seen[0] | seen[1] | seen[2] == {e.description for e in _examples(20)}
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2])


def test_epoch_shuffling_is_deterministic_and_varies_by_epoch(tmp_path):
    write_shards(_examples(12), str(tmp_path), shard_size=2)
    ds = ShardedRecordDataset(str(tmp_path), seed=1)
    e0a = [e.description for e in ds.epoch(0)]
    e0b = [e.description for e in ds.epoch(0)]
    e1 = [e.description for e in ds.epoch(1)]
    assert e0a == e0b
    assert e0a != e1 and sorted(e0a) == sorted(e1)


def test_iter_batches_prefetches_and_propagates_errors(tmp_path):
    class FakePipeline:
        def make_batch(self, group):
            return [e.description for e in group]

    exs = _examples(7)
    batches = list(iter_batches(iter(exs), FakePipeline(), batch_size=3))
    assert batches == [[e.description for e in exs[:3]],
                       [e.description for e in exs[3:6]]]
    batches = list(iter_batches(iter(exs), FakePipeline(), batch_size=3,
                                drop_remainder=False))
    assert len(batches) == 3 and len(batches[-1]) == 1

    class BoomPipeline:
        def make_batch(self, group):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(iter_batches(iter(exs), BoomPipeline(), batch_size=3))


def test_checkpoint_manager_retention_and_restore(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from sam_audio_tpu.train.checkpoints import TrainCheckpointManager
    from sam_audio_tpu.train.flow_matching import TrainState

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    with TrainCheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                                keep_period=4) as mgr:
        for step in range(1, 8):
            state = TrainState(
                jax.tree_util.tree_map(lambda x: x + step, params),
                opt_state, jnp.asarray(step, jnp.int32), None,
            )
            assert mgr.save(state, force=True)
        mgr.wait_until_finished()
        steps = mgr.all_steps()
        # last 2 retained + multiples of keep_period
        assert 6 in steps and 7 in steps and 4 in steps
        assert 1 not in steps and 2 not in steps

        template = TrainState(params, opt_state,
                              jnp.asarray(0, jnp.int32), None)
        restored = mgr.restore(template)
        assert int(restored.step) == 7
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.asarray(params["w"]) + 7)
        # optimizer state structure survives the round-trip
        chex_like = jax.tree_util.tree_structure(opt_state)
        assert jax.tree_util.tree_structure(restored.opt_state) == chex_like

        r4 = mgr.restore(template, step=4)
        assert int(r4.step) == 4


def test_batches_per_epoch_equalizes_uneven_processes(tmp_path):
    """Shard striding gives processes unequal example counts; multi-host dp
    training bounds every process to the global-min batch count so no
    process dispatches an extra collective step (which would deadlock the
    cluster). The bound must be computable identically on every process
    with no communication."""
    # 11 examples in shards of 3 -> shard sizes [3, 3, 3, 2]: striding over
    # 2 processes is unbalanced (6 vs 5 examples -> 3 vs 2 batches of 2)
    write_shards(_examples(11), str(tmp_path), shard_size=3)

    class CountPipeline:
        def make_batch(self, group):
            return len(group)

    counts = []
    limits = []
    for p in range(2):
        ds = ShardedRecordDataset(str(tmp_path), process_index=p,
                                  process_count=2, seed=0)
        limit = ds.batches_per_epoch(0, batch_size=2)
        limits.append(limit)
        n = sum(1 for _ in iter_batches(ds.epoch(0), CountPipeline(), 2,
                                        max_batches=limit))
        counts.append(n)
    # both processes compute the same bound and yield exactly that many
    assert limits[0] == limits[1]
    assert counts[0] == counts[1] == limits[0] > 0
    # without the bound the processes WOULD diverge (this is the hazard)
    raw = []
    for p in range(2):
        ds = ShardedRecordDataset(str(tmp_path), process_index=p,
                                  process_count=2, seed=0)
        raw.append(sum(1 for _ in iter_batches(ds.epoch(0),
                                               CountPipeline(), 2)))
    assert raw[0] != raw[1]


def test_iter_batches_early_stop_releases_prefetch_worker(tmp_path):
    """Breaking out of iter_batches (--max-steps, a step exception) must let
    the prefetch worker exit instead of leaving it blocked forever on a
    full queue, pinning prefetched device batches in HBM."""
    import threading

    write_shards(_examples(32), str(tmp_path), shard_size=32)
    ds = ShardedRecordDataset(str(tmp_path), seed=0)

    class CountPipeline:
        def make_batch(self, group):
            return len(group)

    before = {t.ident for t in threading.enumerate()}
    it = iter_batches(ds.epoch(0), CountPipeline(), 2, prefetch=1)
    assert next(it) == 2
    it.close()  # consumer stops early
    # the worker must exit promptly (iter_batches joins it on close)
    leaked = [t for t in threading.enumerate()
              if t.ident not in before and t.is_alive()]
    assert not leaked
