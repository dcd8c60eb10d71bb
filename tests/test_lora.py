"""LoRA adapter fine-tuning (train/lora.py).

The reference is inference-only (SURVEY.md section 0); LoRA extends the
training subsystem with parameter-efficient fine-tuning: W' = W +
(alpha/rank) * B @ A over the DiT attention projections (stacked-layer
aware), trained through the pure `lora_merge` reparameterization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.train.flow_matching import flow_matching_loss, synthetic_batch
from sam_audio_tpu.train.lora import (
    DEFAULT_TARGETS,
    FFN_TARGETS,
    LoRATrainer,
    load_lora,
    lora_init,
    lora_merge,
    merge_lora_checkpoint,
    save_lora,
)


@pytest.fixture(scope="module")
def model():
    return SAMAudio.init_random(jax.random.PRNGKey(0), tiny_test_config())


def test_init_targets_attention_and_stacked_layers(model):
    adapters = lora_init(jax.random.PRNGKey(1), model.params, rank=3)
    # 4 projections x (self + cross) attention, stacked over layers
    assert len(adapters) == 8
    n_layers = model.cfg.transformer.n_layers
    dim = model.cfg.transformer.dim
    wq = adapters["transformer/layers/attention/wq/weight"]
    assert wq["a"].shape == (n_layers, 3, dim)
    assert wq["b"].shape == (n_layers, dim, 3)
    assert not np.any(np.asarray(wq["b"]))  # zero-init B

    ffn = lora_init(jax.random.PRNGKey(1), model.params, rank=2,
                    targets=FFN_TARGETS)
    assert len(ffn) == 8 + 3
    hidden = model.cfg.transformer.ffn_hidden_dim
    w1 = ffn["transformer/layers/feed_forward/w1/weight"]
    assert w1["a"].shape == (n_layers, 2, dim)
    assert w1["b"].shape == (n_layers, hidden, 2)


def test_merge_is_identity_at_init_and_matches_manual_delta(model):
    adapters = lora_init(jax.random.PRNGKey(1), model.params, rank=2)
    merged = lora_merge(model.params, adapters, scaling=0.5)
    base_wq = model.params["transformer"]["layers"]["attention"]["wq"]["weight"]
    np.testing.assert_array_equal(
        np.asarray(merged["transformer"]["layers"]["attention"]["wq"]["weight"]),
        np.asarray(base_wq))  # B==0 -> exact base

    # non-zero B: per-layer delta must equal the hand-computed outer product
    key = "transformer/layers/attention/wk/weight"
    adapters[key]["b"] = jax.random.normal(
        jax.random.PRNGKey(2), adapters[key]["b"].shape)
    merged = lora_merge(model.params, adapters, scaling=0.5)
    got = np.asarray(merged["transformer"]["layers"]["attention"]["wk"]["weight"])
    base = np.asarray(model.params["transformer"]["layers"]["attention"]["wk"]["weight"])
    a = np.asarray(adapters[key]["a"])
    b = np.asarray(adapters[key]["b"])
    for layer in range(a.shape[0]):
        np.testing.assert_allclose(
            got[layer], base[layer] + 0.5 * (b[layer] @ a[layer]),
            rtol=1e-6, atol=1e-6)
    # non-target weights untouched
    np.testing.assert_array_equal(
        np.asarray(merged["transformer"]["t_block"]["weight"]),
        np.asarray(model.params["transformer"]["t_block"]["weight"]))


def test_merge_rejects_orphan_adapters(model):
    adapters = lora_init(jax.random.PRNGKey(1), model.params, rank=2)
    adapters["transformer/nonexistent/weight"] = adapters.pop(
        "transformer/layers/attention/wq/weight")
    with pytest.raises(ValueError, match="no matching param"):
        lora_merge(model.params, adapters)


def test_init_rejects_unmatched_targets_and_bad_rank(model):
    with pytest.raises(ValueError, match="no params matched"):
        lora_init(jax.random.PRNGKey(0), model.params, rank=2,
                  targets=(r"does_not_exist",))
    with pytest.raises(ValueError, match="rank"):
        lora_init(jax.random.PRNGKey(0), model.params, rank=0)


def test_gradients_flow_only_through_adapters(model):
    adapters = lora_init(jax.random.PRNGKey(1), model.params, rank=2)
    batch = synthetic_batch(model.cfg, jax.random.PRNGKey(3), batch_size=2)

    def loss_fn(ad):
        merged = lora_merge(model.params, adapters=ad, scaling=1.0)
        return flow_matching_loss(merged, model.cfg, batch,
                                  jax.random.PRNGKey(4))

    grads = jax.grad(loss_fn)(adapters)
    # at B==0 the A-grads are zero (dL/dA = B^T dL/dW = 0) but B-grads are
    # not (dL/dB = dL/dW A^T with A random) — the classic LoRA first step.
    gb = grads["transformer/layers/attention/wq/weight"]["b"]
    assert float(jnp.max(jnp.abs(gb))) > 0.0


def test_trainer_reduces_loss_and_freezes_base(model):
    trainer = LoRATrainer(model.cfg, model.params, rank=4,
                          learning_rate=3e-3, rng=jax.random.PRNGKey(5))
    base_before = jax.tree_util.tree_map(np.asarray, trainer.base_params)
    rng = jax.random.PRNGKey(6)
    batch = synthetic_batch(model.cfg, jax.random.PRNGKey(7), batch_size=2)
    losses = []
    for i in range(8):
        rng, k = jax.random.split(rng)
        # same batch + same step rng each time: pure optimization progress
        losses.append(float(trainer.step(batch, jax.random.PRNGKey(8))["loss"]))
    assert losses[-1] < losses[0], losses
    # base weights bit-identical after training
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        base_before, trainer.base_params)
    assert int(trainer.state.step) == 8


def test_adapter_roundtrip_and_merged_export(model, tmp_path):
    trainer = LoRATrainer(model.cfg, model.params, rank=2, alpha=4.0,
                          learning_rate=1e-2, rng=jax.random.PRNGKey(9))
    batch = synthetic_batch(model.cfg, jax.random.PRNGKey(10), batch_size=2)
    for _ in range(2):
        trainer.step(batch, jax.random.PRNGKey(11))

    path = str(tmp_path / "lora.npz")
    trainer.save_adapters(path)
    adapters, meta = load_lora(path)
    assert meta["rank"] == 2 and meta["alpha"] == 4.0
    assert meta["scaling"] == 2.0

    merged_live = trainer.ema_inference_params()
    merged_loaded = merge_lora_checkpoint(model.params, path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
        merged_live, merged_loaded)

    # merged params drive the standard inference path
    out = SAMAudio(model.cfg, merged_loaded,
                   tokenizer=model.tokenizer)
    assert out is not None


def test_save_lora_rejects_default_meta_collision(tmp_path, model):
    adapters = lora_init(jax.random.PRNGKey(0), model.params, rank=1)
    path = str(tmp_path / "l.npz")
    save_lora(path, jax.device_get(adapters), rank=1,
              targets=DEFAULT_TARGETS)
    loaded, meta = load_lora(path)
    assert set(loaded) == set(adapters)
    assert meta["targets"] == list(DEFAULT_TARGETS)


def test_trainer_on_dp_tp_mesh_matches_single_device(model):
    """Adapters replicate over the mesh; two steps match unsharded exactly
    (fp32 params, deterministic batch/rng)."""
    from sam_audio_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=2, tp=2)
    batch = synthetic_batch(model.cfg, jax.random.PRNGKey(12), batch_size=2)
    t_single = LoRATrainer(model.cfg, model.params, rank=2,
                           learning_rate=1e-3, rng=jax.random.PRNGKey(13))
    t_mesh = LoRATrainer(model.cfg, model.params, rank=2,
                         learning_rate=1e-3, rng=jax.random.PRNGKey(13),
                         mesh=mesh)
    for _ in range(2):
        m1 = t_single.step(batch, jax.random.PRNGKey(14))
        m2 = t_mesh.step(batch, jax.random.PRNGKey(14))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        jax.device_get(t_single.adapters), jax.device_get(t_mesh.adapters))


def test_cli_lora_smoke_with_adapter_export(tmp_path):
    import dataclasses
    import json

    from sam_audio_tpu.train.__main__ import main as train_main

    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(dataclasses.asdict(tiny_test_config()), f)
    lora_path = str(tmp_path / "adapters.npz")
    export = str(tmp_path / "snapshot")
    rc = train_main([
        "--synthetic", "2", "--random-init", "--config", str(cfg_path),
        "--batch-size", "2", "--lora-rank", "2", "--lora-alpha", "4",
        "--lora-out", lora_path, "--export-dir", export,
        "--log-every", "0",
    ])
    assert rc == 0
    adapters, meta = load_lora(lora_path)
    assert meta["rank"] == 2 and len(adapters) == 8
    # exported snapshot loads through the standard serving path
    model = SAMAudio.from_pretrained(export, allow_random_towers=True)
    assert model.cfg.transformer.n_layers == tiny_test_config().transformer.n_layers


def test_initial_state_has_no_aliased_buffers(model):
    """The train step donates the TrainState; a buffer appearing twice in a
    donated pytree is an INVALID_ARGUMENT on real TPU backends (CPU ignores
    donation, so only this identity check catches it hermetically). The EMA
    tree must be a real copy of the f32 adapters, not an astype no-op."""
    trainer = LoRATrainer(tiny_test_config(), model.params, rank=2,
                          ema_decay=0.999, rng=jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(trainer.state)
    assert len({id(leaf) for leaf in leaves}) == len(leaves)


def test_full_trainer_f32_ema_has_no_aliased_buffers(model):
    """Same donated-buffer hazard in the full Trainer: with f32 params the
    EMA's astype(f32) would alias every trainable leaf."""
    from sam_audio_tpu.train.flow_matching import Trainer

    trainer = Trainer(tiny_test_config(), model.params, ema_decay=0.999)
    leaves = jax.tree_util.tree_leaves(trainer.state)
    seen = {}
    dup_trainable = []
    for leaf in leaves:
        if id(leaf) in seen:
            dup_trainable.append(leaf)
        seen[id(leaf)] = leaf
    # frozen-tower leaves intentionally alias between params and EMA (no
    # extra HBM; written back unchanged) — proven on hardware. No TRAINABLE
    # leaf may alias: every duplicate must belong to a frozen tower.
    params, ema = trainer.state.params, trainer.state.ema_params
    for key in ("transformer",):
        p_ids = {id(x) for x in jax.tree_util.tree_leaves(params[key])}
        e_ids = {id(x) for x in jax.tree_util.tree_leaves(ema[key])}
        assert not (p_ids & e_ids)
