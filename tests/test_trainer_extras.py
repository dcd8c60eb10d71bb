"""Training-recipe hardening: LR schedules, EMA params, fit/eval hooks."""

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import sam_audio_init
from sam_audio_tpu.train.flow_matching import (
    Trainer,
    make_lr_schedule,
    synthetic_batch,
)

CFG = tiny_test_config()


def test_lr_schedule_shapes():
    s = make_lr_schedule(1e-3, "cosine", warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    assert float(s(60)) < 1e-3
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-9)

    lin = make_lr_schedule(1e-3, "linear", warmup_steps=0, total_steps=100,
                           final_lr_ratio=0.1)
    np.testing.assert_allclose(float(lin(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(100)), 1e-4, rtol=1e-5)

    # plain constant stays a float (bit-identical legacy behavior)
    assert make_lr_schedule(1e-3) == 1e-3


def test_ema_tracks_trainable_and_aliases_frozen():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, learning_rate=3e-3, ema_decay=0.5)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                trainer.state.params)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=2,
                            t_frames=8)
    for _ in range(3):
        trainer.step(batch, jax.random.PRNGKey(2))

    ema = trainer.state.ema_params
    live = trainer.state.params
    # frozen towers: EMA leaf is the live param (no separate buffer)
    np.testing.assert_array_equal(
        np.asarray(ema["audio_codec"]["in_proj"]["weight"]),
        np.asarray(live["audio_codec"]["in_proj"]["weight"]))
    # trainable: EMA lags the live params but has moved from init
    w_live = np.asarray(live["transformer"]["layers"]["attention"]["wq"]["weight"])
    w_ema = np.asarray(ema["transformer"]["layers"]["attention"]["wq"]["weight"])
    w_init = np.asarray(p0["transformer"]["layers"]["attention"]["wq"]["weight"])
    assert not np.allclose(w_ema, w_init)
    assert not np.allclose(w_ema, w_live)
    # ema decay 0.5 after 3 steps: ema closer to live than to init
    assert np.abs(w_ema - w_live).mean() < np.abs(w_ema - w_init).mean()

    inf = trainer.ema_inference_params()
    assert inf["transformer"]["layers"]["attention"]["wq"]["weight"].dtype == \
        live["transformer"]["layers"]["attention"]["wq"]["weight"].dtype


def test_fit_loop_with_eval_hook():
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, learning_rate=3e-3, lr_schedule="cosine",
                      warmup_steps=2, total_steps=10)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=2,
                            t_frames=8)
    evals = []

    def eval_fn(tr, step):
        evals.append(step)
        return {"val_metric": 1.0}

    logs = []
    history = trainer.fit([batch] * 6, jax.random.PRNGKey(0), eval_fn=eval_fn,
                          eval_every=3, log_every=2, log_fn=logs.append)
    assert [h["step"] for h in history] == [1, 2, 3, 4, 5, 6]
    assert evals == [3, 6]
    assert "val_metric" in history[2] and "val_metric" in history[5]
    assert len(logs) == 3  # steps 1, 3, 5 (i = 0, 2, 4)
    assert all(np.isfinite(h["loss"]) for h in history)


def test_frozen_towers_bit_identical_after_steps():
    """Weight decay must not touch frozen towers: grads are masked AND adamw's
    add_decayed_weights is masked (ADVICE r2), so codec/T5 leaves stay
    bit-identical across optimizer steps."""
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, learning_rate=3e-3, weight_decay=0.1)
    # snapshot to numpy BEFORE stepping: the trainer donates state buffers
    frozen_before = jax.tree_util.tree_map(
        np.asarray, {"audio_codec": trainer.state.params["audio_codec"],
                     "text_encoder": trainer.state.params["text_encoder"]})
    wq_before = np.asarray(
        trainer.state.params["transformer"]["layers"]["attention"]["wq"]
        ["weight"])
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=2,
                            t_frames=8)
    for _ in range(2):
        trainer.step(batch, jax.random.PRNGKey(2))
    frozen_after = {"audio_codec": trainer.state.params["audio_codec"],
                    "text_encoder": trainer.state.params["text_encoder"]}
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        frozen_before, frozen_after)
    # and the trainable DiT did move
    assert not np.allclose(
        wq_before,
        np.asarray(trainer.state.params["transformer"]["layers"]["attention"]
                   ["wq"]["weight"]))


def test_grad_accumulation_matches_full_batch_step():
    """Trainer(accum_steps=2): two half-batch micro-steps produce EXACTLY one
    full-batch optimizer update (optax.MultiSteps averages the micro grads,
    then the clip+adamw chain applies on the mean)."""
    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    full = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=4,
                           t_frames=8)
    halves = [
        {k: v[:2] for k, v in full.items()},
        {k: v[2:] for k, v in full.items()},
    ]
    rng = jax.random.PRNGKey(2)

    t_ref = Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                    learning_rate=1e-3)
    t_acc = Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                    learning_rate=1e-3, accum_steps=2)

    # flow_matching_loss draws per-ROW noise from the call rng, so the clean
    # equivalence is: accumulating the SAME micro-grad twice (same batch,
    # same rng) averages to itself, and the inner clip+adamw chain applies
    # exactly once — equal to one plain step on that micro-batch.
    m_ref = t_ref.step(halves[0], rng)
    m1 = t_acc.step(halves[0], rng)
    m2 = t_acc.step(halves[0], rng)  # same micro-batch, same rng
    wq_ref = t_ref.state.params["transformer"]["layers"]["attention"]["wq"]
    wq_acc = t_acc.state.params["transformer"]["layers"]["attention"]["wq"]
    np.testing.assert_allclose(np.asarray(wq_acc["weight"]),
                               np.asarray(wq_ref["weight"]),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert np.isfinite(float(m_ref["loss"]))

    # mid-accumulation the params must NOT have moved
    t_mid = Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                    learning_rate=1e-3, accum_steps=2)
    t_mid.step(halves[0], rng)
    wq_mid = t_mid.state.params["transformer"]["layers"]["attention"]["wq"]
    np.testing.assert_allclose(
        np.asarray(wq_mid["weight"]),
        np.asarray(params["transformer"]["layers"]["attention"]["wq"]["weight"]),
    )


def test_remat_dots_policy_matches_full():
    """remat='dots' changes WHAT the backward saves, never the math: one
    step from identical init with identical rng must produce identical
    losses and (numerically) identical updated params vs remat='full'."""
    import pytest

    params = sam_audio_init(jax.random.PRNGKey(0), CFG)
    batch = synthetic_batch(CFG, jax.random.PRNGKey(1), batch_size=2,
                            t_frames=8)
    rng = jax.random.PRNGKey(2)

    t_full = Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                     learning_rate=1e-3, remat="full")
    t_dots = Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                     learning_rate=1e-3, remat="dots")
    m_full = t_full.step(batch, rng)
    m_dots = t_dots.step(batch, rng)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_dots["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_full["grad_norm"]),
                               float(m_dots["grad_norm"]), rtol=1e-4)
    wq_f = t_full.state.params["transformer"]["layers"]["attention"]["wq"]
    wq_d = t_dots.state.params["transformer"]["layers"]["attention"]["wq"]
    np.testing.assert_allclose(np.asarray(wq_d["weight"]),
                               np.asarray(wq_f["weight"]),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="remat policy"):
        Trainer(CFG, jax.tree_util.tree_map(jnp.copy, params),
                remat="bogus").step(batch, rng)


def test_flow_matching_learning_improves_generation():
    """End-to-end proof that the training recipe LEARNS, not merely runs:
    on a small fixed dataset the CFM objective is exactly recoverable (the
    conditioning determines x1, so v*(x_t, t) = x1 - x0 is a function of the
    inputs), so (a) the loss must collapse well below its init value and
    (b) integrating the TRAINED velocity field from fresh noise must land
    far closer to the memorized target latents than the init field does.
    Guards against silent training bugs that keep every step finite (which
    the other tests check) while learning nothing."""
    from sam_audio_tpu.models.sam_audio import forward
    from sam_audio_tpu.ops.ode import odeint

    cfg = CFG
    batch = synthetic_batch(cfg, jax.random.PRNGKey(4), batch_size=4,
                            t_frames=8)
    x1 = np.asarray(batch["target_latents"])

    def generate(p, noise):
        def vf(t, y):
            return forward(
                p, cfg, noisy_audio=y,
                audio_features=batch["audio_features"],
                text_features=batch["text_features"],
                time=jnp.broadcast_to(t, (y.shape[0],)),
                text_mask=batch["text_mask"],
                anchor_ids=batch["anchor_ids"],
                anchor_alignment=batch["anchor_alignment"],
                audio_pad_mask=batch["audio_pad_mask"],
                compute_dtype=jnp.float32,
            ).astype(y.dtype)

        return np.asarray(odeint(vf, noise, method="midpoint",
                                 step_size=2 / 8))

    # generation noise != any training draw: tests the field, not a replay
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(5), x1.shape))
    params = sam_audio_init(jax.random.PRNGKey(3), cfg)
    mse_init = float(np.mean((generate(params, jnp.asarray(noise)) - x1) ** 2))

    # Trainer donates state buffers — params must not be reused after this
    trainer = Trainer(cfg, params, learning_rate=3e-3)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(200):
        rng, sk = jax.random.split(rng)
        losses.append(float(trainer.step(batch, sk)["loss"]))

    head = float(np.mean(losses[:10]))
    tail = float(np.mean(losses[-10:]))
    assert tail < 0.25 * head, (head, tail)

    mse_trained = float(np.mean(
        (generate(trainer.state.params, jnp.asarray(noise)) - x1) ** 2))
    assert mse_trained < 0.35 * mse_init, (mse_init, mse_trained)
