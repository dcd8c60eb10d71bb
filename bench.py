"""Throughput benchmark: sam-audio-large-equivalent separation on one TPU chip.

Measures the BASELINE.md north-star metric: audio-seconds separated per
wall-clock second per chip, at reranking_candidates=8 on 10 s clips — the
full jitted pipeline (DAC-VAE encode -> T5 text encode -> 32-NFE midpoint ODE
over the 1B-param DiT -> DAC-VAE decode of all k targets -> ON-DEVICE
candidate scoring with the real CLAP tower (HTSAT-tiny audio branch +
RoBERTa text branch) -> argmax -> decode of the winner's residual. This
matches the reference's end-to-end `separate(reranking_candidates=8)`
semantics where reranking happens inside separate (reference
sam_audio/model/model.py:306-330) and the BASELINE.json north star
("CLAP/Judge/ImageBind scorers compiled on device").

The scorer runs as a SECOND device-sequenced XLA dispatch by default
(matching production separate()); one host sync covers both programs.
Fusing it into the generation program measured ~56 ms slower at k=8 CLAP
(XLA scheduling interference) — `--fused-scorer` keeps that A/B, and
`--split3` additionally splits ODE from decode (measured: no further
change). See PARITY.md "Split-dispatch study".

--ranker judge times the full judge stack instead (ModernBERT text tower +
DAC-VAE encoder on mixture+candidate pairs + 2x PE-AV transformers, reference
sam_audio/model/judge.py:90-132). --ranker energy keeps the old scorer-free
stand-in for A/B-ing scorer cost.

Prints ONE JSON line:
  {"metric": "audio_sec_per_sec_per_chip", "value": X, "unit": "audio_sec/sec",
   "vs_baseline": X / 8.0, "p50_ms": ..., "extras": {...}}
(vs_baseline is relative to the >=8x-real-time target; the reference publishes
no throughput numbers, BASELINE.md. `value` is the sequential per-request
number — it is also the p50 latency; `extras.pipelined_stream_x` records the
loaded-server stream throughput measured with the same compiled programs.)
"""

from __future__ import annotations

import json
import os
from functools import partial
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; honor an explicit platform request (debug/CI) the way that
# actually works here — jax.config AFTER import (see CLAUDE.md).
if os.environ.get("SAM_AUDIO_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SAM_AUDIO_BENCH_PLATFORM"])

# Persist compiled executables across runs (first compile of the 1B pipeline
# is minutes; subsequent bench invocations reuse the cache).
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/sam_audio_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def _gen_random_like(init_fn, key, scale: float = 0.02):
    """Materialize a random param tree in ONE fused XLA program instead of one
    RNG dispatch per leaf (the relay-attached backend pays ~25 ms/dispatch)."""
    shapes = jax.eval_shape(init_fn, key)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def _gen(k):
        keys = jax.random.split(k, len(leaves))
        return [
            jax.random.normal(kk, s.shape, s.dtype) * scale
            for kk, s in zip(keys, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, _gen(key))


def _preflight_probe(
    deadline_s: float = float(os.environ.get("SAM_AUDIO_PREFLIGHT_S", 300.0)),
):
    """Fail fast (instead of hanging forever) when the TPU relay is down.

    Backend init and every dispatch go through the axon relay; when it is
    unreachable they block indefinitely with no timeout, which would hang the
    driver's bench run. Run one tiny jitted matmul under a watchdog: a healthy
    chip completes it in well under a minute (compile included), so if the
    deadline passes we hard-exit(2) with a diagnostic on stderr. stdout stays
    clean — no JSON line is emitted on failure.
    """
    import os
    import threading

    done = threading.Event()

    def _watchdog():
        if not done.wait(deadline_s):
            print(
                f"bench preflight: no device response within {deadline_s:.0f}s"
                " — TPU relay unreachable; aborting (no metric emitted)",
                file=sys.stderr, flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    x = jnp.ones((128, 128), jnp.bfloat16)
    _ = float(jnp.sum(jax.jit(lambda a: a @ a)(x)))  # scalar fetch = real sync
    done.set()


def main(candidates: int = 8, seconds: float = 10.0, batch: int = 1,
         iters: int = 3, preview_nfe: int = 0, int8: bool = False,
         ranker: str = "clap", int4: bool = False, visual: bool = False,
         split_scorer: bool = True, visual_stride: int = 1,
         pipelined: bool = False):
    from sam_audio_tpu.config import SAMAudioConfig
    from sam_audio_tpu.models.sam_audio import (
        decode_channel,
        gather_candidates,
        num_params,
        sam_audio_init,
        separate_latents,
    )
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    _t_start = time.time()
    cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                         param_dtype="bfloat16")
    _preflight_probe()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    params = _gen_random_like(
        lambda k: sam_audio_init(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    print(f"init: {num_params(params)/1e9:.2f}B params in {time.time()-t0:.1f}s",
          file=sys.stderr)
    if int8:
        from sam_audio_tpu.ops.quant import quantize_sam_audio_params

        params = jax.jit(quantize_sam_audio_params)(params)
        print("int8 serving mode: DiT matmuls quantized (opt-in, non-parity)",
              file=sys.stderr)
    elif int4:
        from sam_audio_tpu.ops.quant import quantize_sam_audio_params
        from functools import partial as _partial

        params = jax.jit(_partial(quantize_sam_audio_params, bits=4))(params)
        print("int4 weight-storage mode: DiT weights packed (opt-in, "
              "non-parity; k=1 latency study)", file=sys.stderr)

    sr = cfg.audio_codec.sample_rate
    hop = cfg.audio_codec.hop_length
    t_wav = int(seconds * sr)
    t_wav = (t_wav // hop) * hop
    t_frames = t_wav // hop

    rng = np.random.RandomState(0)
    audios = jnp.asarray(rng.randn(batch, 1, t_wav).astype(np.float32) * 0.1)
    descriptions = ["a dog barking in the distance"] * batch
    tok = ByteFallbackTokenizer(cfg.text_encoder.vocab_size)
    ids, mask = tok(descriptions)
    text_ids = jnp.asarray(ids)
    text_mask = jnp.asarray(mask)
    anchor_ids = jnp.zeros((batch, 4), jnp.int32).at[:, 1:].set(3)
    anchor_alignment = jnp.zeros((batch, t_frames), jnp.int32)
    audio_pad_mask = jnp.ones((batch, t_frames), jnp.bool_)
    noise = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch * candidates, t_frames, 2 * cfg.audio_codec.codebook_dim),
        jnp.float32,
    )

    # --- visual prompting: PE-Core-L14-336 conditioning in the measured step.
    # The reference encodes ONE frame per latent frame (~25 fps, model.py:
    # 186-191, vision_encoder.py:47-69) before candidate expansion — the ViT-L
    # tower over t_frames 336^2 frames is the single largest FLOP block of the
    # visual pipeline (SURVEY.md hot loop #3). Frames are generated on device
    # pre-normalized (the resize/mask transform is host-side preprocessing,
    # like the reference's).
    pe_aux = {}
    if visual:
        from sam_audio_tpu.models.pe_clip import encode_images, pe_clip_init

        vcfg = cfg.vision_encoder
        pe_aux = _gen_random_like(
            lambda k: pe_clip_init(k, vcfg, jnp.bfloat16),
            jax.random.PRNGKey(11),
        )
        if int8:
            from sam_audio_tpu.ops.quant import quantize_pe_params

            pe_aux = jax.jit(quantize_pe_params)(pe_aux)
            print("int8 PE vision tower: ViT matmuls quantized",
                  file=sys.stderr)
        pe_frames = jax.jit(
            lambda k: jax.random.normal(
                k, (batch * t_frames, 3, vcfg.image_size, vcfg.image_size),
                jnp.bfloat16) * 0.5
        )(jax.random.PRNGKey(12))
        print(f"visual prompting: PE vision tower over {batch * t_frames} "
              f"frames @{vcfg.image_size}^2 compiled into the step",
              file=sys.stderr)

        def encode_video_features(pe_aux):
            if visual_stride > 1:
                from sam_audio_tpu.models.pe_clip import (
                    interp_strided_features,
                )

                fr = pe_frames.reshape(batch, t_frames,
                                       *pe_frames.shape[1:])[:, ::visual_stride]
                feats = encode_images(pe_aux, fr.reshape(-1, *fr.shape[2:]),
                                      vcfg, compute_dtype=compute_dtype)
                feats = feats.reshape(batch, fr.shape[1], -1)
                feats = jax.vmap(
                    lambda f: interp_strided_features(f, t_frames,
                                                      visual_stride)
                )(feats)
            else:
                feats = encode_images(pe_aux, pe_frames, vcfg,
                                      compute_dtype=compute_dtype)
                feats = feats.reshape(batch, t_frames, -1)
            return jnp.swapaxes(feats, 1, 2).astype(jnp.float32)  # (B, D, T)

    # --- candidate scorer, compiled INTO the separation program -------------
    # The reference reranks inside separate() (model.py:306-330); the measured
    # step must therefore pay the scorer's forward. Weights are random (this
    # is a throughput bench) but the architecture/compute is the real tower.
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if ranker == "clap":
        from sam_audio_tpu.models.clap import (
            ClapConfig,
            clap_audio_embed,
            clap_init,
            clap_text_embed,
        )
        from sam_audio_tpu.text_tokenizer import get_roberta_tokenizer

        clap_cfg = ClapConfig()
        aux = _gen_random_like(
            lambda k: clap_init(k, clap_cfg, jnp.bfloat16), jax.random.PRNGKey(7)
        )
        if int8:
            from sam_audio_tpu.ops.quant import quantize_clap_params

            aux = jax.jit(quantize_clap_params)(aux)
            print("int8 CLAP scorer: HTSAT + RoBERTa matmuls quantized",
                  file=sys.stderr)
        # random-init scorer tower: the hermetic byte tokenizer is fine here
        c_ids, c_mask = get_roberta_tokenizer(
            clap_cfg.text_vocab, allow_fallback=True
        )(descriptions, max_length=clap_cfg.max_text_len)
        c_ids, c_mask = jnp.asarray(c_ids), jnp.asarray(c_mask)
        # clap_audio_embed repeat-pads/center-truncates to the 10 s CLAP
        # window internally (fit_duration), so any bench --seconds works

        def score_candidates(aux, targets):
            # HTSAT-tiny swin audio tower + RoBERTa text tower, both on-device
            a_emb = clap_audio_embed(aux, clap_cfg, targets, compute_dtype)
            t_emb = clap_text_embed(aux, clap_cfg, c_ids, c_mask, compute_dtype)
            return jnp.einsum(
                "bkd,bd->bk", a_emb.reshape(batch, candidates, -1), t_emb
            )
    elif ranker == "judge":
        from sam_audio_tpu.config import SAMAudioJudgeConfig
        from sam_audio_tpu.models.judge import judge_forward_grouped, judge_init

        jcfg = SAMAudioJudgeConfig()
        aux = _gen_random_like(
            lambda k: judge_init(k, jcfg, jnp.bfloat16), jax.random.PRNGKey(7)
        )
        if int8:
            from sam_audio_tpu.ops.quant import quantize_judge_params

            aux = jax.jit(quantize_judge_params)(aux)
            print("int8 judge scorer: PE-AV + ModernBERT matmuls quantized",
                  file=sys.stderr)
        j_ids = jnp.asarray(
            ByteFallbackTokenizer(jcfg.text_model.vocab_size)(descriptions)[0]
        )

        def score_candidates(aux, targets):
            # full judge stack, grouped: ModernBERT + DAC-VAE encoder + shared
            # PE-AV tower run once per ITEM (mixture side), the finetune PE-AV
            # tower per candidate — exact parity with the flat pair batch
            # (judge_forward_grouped)
            out = judge_forward_grouped(
                aux, jcfg, input_ids=j_ids, input_values=audios,
                separated_values=targets[:, None, :], k=candidates,
                compute_dtype=compute_dtype,
            )
            return out.overall.reshape(batch, candidates)
    elif ranker == "imagebind":
        from sam_audio_tpu.models.imagebind import (
            ImageBindConfig,
            ImageBindHugeConfig,
            audio_to_melclips_jax,
            imagebind_encode_audio,
            imagebind_encode_vision,
            imagebind_huge_init,
            video_to_frame_clips,
        )
        from sam_audio_tpu.ops.resample import resample

        ib_cfg = ImageBindHugeConfig()
        pipe = ImageBindConfig()
        aux = _gen_random_like(
            lambda k: imagebind_huge_init(k, ib_cfg, jnp.bfloat16),
            jax.random.PRNGKey(7),
        )
        if int8:
            from sam_audio_tpu.ops.quant import quantize_imagebind_params

            aux = jax.jit(quantize_imagebind_params)(aux)
            print("int8 ImageBind scorer: audio+vision trunks quantized",
                  file=sys.stderr)
        # prompt video: 1 frame per latent frame at 224^2 (the processor's
        # masked-video output shape). The VideoTransform (clip sampling,
        # /255+normalize, crops) is host-side preprocessing like in the
        # reference (ranking/imagebind.py:89-150); the measured step pays
        # both towers — vision over b*5clips*3crops and audio over
        # b*k*3clips — on device.
        frames = rng.randint(0, 255, (batch, t_frames, 3, 224, 224)) \
            .astype(np.uint8)
        clips = jnp.asarray(np.stack([
            video_to_frame_clips(frames[i], num_clips=5,
                                 frames_per_clip=ib_cfg.vision_frames,
                                 size=ib_cfg.image_size, num_crops=3)
            for i in range(batch)
        ]))

        def score_candidates(aux, targets):
            # full imagebind_huge rerank: ViT-H vision tower on the prompt
            # clips + audio ViT on each candidate's mel clips, cosine per
            # candidate (reference ranking/imagebind.py:174-197)
            v_emb = imagebind_encode_vision(aux, ib_cfg, clips, compute_dtype)
            wav16 = resample(targets.astype(jnp.float32), sr,
                             pipe.sample_rate)
            mels = audio_to_melclips_jax(wav16, pipe)
            a_emb = imagebind_encode_audio(aux, ib_cfg, mels, compute_dtype)
            return jnp.einsum(
                "bkd,bd->bk", a_emb.reshape(batch, candidates, -1), v_emb)
    elif ranker == "energy":
        aux = {}

        def score_candidates(aux, targets):
            return jnp.sum(jnp.square(targets), axis=-1).reshape(
                batch, candidates)
    else:
        raise SystemExit(
            f"unknown --ranker {ranker!r} (clap|judge|imagebind|energy)")
    print(f"ranker: {ranker} (scorer compiled on device)", file=sys.stderr)

    # --fused-scorer A/B arm ONLY: everything in one XLA program. Measured
    # ~56 ms SLOWER than the split default at k=8 CLAP — XLA's scheduler
    # interleaves the scorer with the decoder and degrades both (see module
    # docstring / PARITY.md "Split-dispatch study").
    @partial(jax.jit, static_argnames=())
    def step(params, aux, pe_aux, noise):
        video_features = encode_video_features(pe_aux) if visual else None
        latents = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids, anchor_alignment,
            audio_pad_mask, noise, video_features,
            cfg=cfg, candidates=candidates, use_video=visual,
        )
        targets = decode_channel(params, latents, cfg=cfg, channel=0)
        scores = score_candidates(aux, targets)
        idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        chosen = gather_candidates(latents, idxs, cfg=cfg,
                                   candidates=candidates)
        residual = decode_channel(params, chosen, cfg=cfg, channel=1)
        # block_until_ready may not block on relay backends; return a scalar
        # checksum for a host fetch that does.
        return targets, residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

    @partial(jax.jit, static_argnames=())
    def step_vision(pe_aux):
        # split path: the PE vision tower as its own dispatch (same
        # interference hypothesis as the scorer — it is the largest
        # non-DiT compute block when --visual is on)
        return encode_video_features(pe_aux)

    @partial(jax.jit, static_argnames=())
    def step_gen(params, video_features, noise):
        # generation half of the split-scorer experiment: ODE + target decode
        latents = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids, anchor_alignment,
            audio_pad_mask, noise, video_features,
            cfg=cfg, candidates=candidates, use_video=visual,
        )
        targets = decode_channel(params, latents, cfg=cfg, channel=0)
        return latents, targets

    @partial(jax.jit, static_argnames=())
    def step_ode(params, video_features, noise):
        # 3-way-split experiment: ODE alone, decode as its own dispatch
        return separate_latents(
            params, audios, text_ids, text_mask, anchor_ids, anchor_alignment,
            audio_pad_mask, noise, video_features,
            cfg=cfg, candidates=candidates, use_video=visual,
        )

    @partial(jax.jit, static_argnames=())
    def step_decode(params, latents):
        return decode_channel(params, latents, cfg=cfg, channel=0)

    @partial(jax.jit, static_argnames=())
    def step_score(params, aux, latents, targets):
        # scoring half: scorer tower + argmax + lazy residual decode. Runs as
        # a SECOND dispatch, device-sequenced behind step_gen via its inputs;
        # one host sync on this program's checksum covers both.
        scores = score_candidates(aux, targets)
        idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        chosen = gather_candidates(latents, idxs, cfg=cfg,
                                   candidates=candidates)
        residual = decode_channel(params, chosen, cfg=cfg, channel=1)
        return residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

    @partial(jax.jit, static_argnames=())
    def step_gen_preview(params, video_features, noise):
        # preview-mode generation half: cheap-NFE candidate solves + decode
        preview = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids,
            anchor_alignment, audio_pad_mask, noise, video_features,
            cfg=cfg, candidates=candidates, use_video=visual,
            ode_step_size=2.0 / preview_nfe,  # only called when preview_nfe
        )
        return decode_channel(params, preview, cfg=cfg, channel=0)

    @partial(jax.jit, static_argnames=())
    def step_select_noise(aux, targets_prev, noise):
        scores = score_candidates(aux, targets_prev)
        idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return gather_candidates(noise, idxs, cfg=cfg, candidates=candidates)

    @partial(jax.jit, static_argnames=())
    def step_final(params, video_features, chosen_noise):
        chosen = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids,
            anchor_alignment, audio_pad_mask, chosen_noise, video_features,
            cfg=cfg, candidates=1, use_video=visual,
        )
        targets = decode_channel(params, chosen, cfg=cfg, channel=0)
        residual = decode_channel(params, chosen, cfg=cfg, channel=1)
        return targets, residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

    @partial(jax.jit, static_argnames=())
    def step_preview(params, aux, pe_aux, noise):
        # preview-NFE reranking: cheap candidate solves, full solve for
        # the winner (separate(preview_nfe=...) opt-in mode)
        video_features = encode_video_features(pe_aux) if visual else None
        preview = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids,
            anchor_alignment, audio_pad_mask, noise, video_features,
            cfg=cfg, candidates=candidates, use_video=visual,
            ode_step_size=2.0 / preview_nfe,
        )
        targets_prev = decode_channel(params, preview, cfg=cfg, channel=0)
        scores = score_candidates(aux, targets_prev)
        idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        chosen_noise = gather_candidates(noise, idxs, cfg=cfg,
                                         candidates=candidates)
        chosen = separate_latents(
            params, audios, text_ids, text_mask, anchor_ids,
            anchor_alignment, audio_pad_mask, chosen_noise, video_features,
            cfg=cfg, candidates=1, use_video=visual,
        )
        targets = decode_channel(params, chosen, cfg=cfg, channel=0)
        residual = decode_channel(params, chosen, cfg=cfg, channel=1)
        return targets, residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

    def run_async():
        if split_scorer:
            vf = step_vision(pe_aux) if visual else None
        if split_scorer and preview_nfe:
            targets_prev = step_gen_preview(params, vf, noise)
            chosen_noise = step_select_noise(aux, targets_prev, noise)
            targets, residual, csum = step_final(params, vf, chosen_noise)
        elif split_scorer == 3:
            latents = step_ode(params, vf, noise)
            targets = step_decode(params, latents)
            residual, csum = step_score(params, aux, latents, targets)
        elif split_scorer:
            latents, targets = step_gen(params, vf, noise)
            residual, csum = step_score(params, aux, latents, targets)
        else:
            targets, residual, csum = (step_preview if preview_nfe else step)(
                params, aux, pe_aux, noise)
        return targets, residual, csum

    def run():
        targets, residual, csum = run_async()
        float(csum)  # sync point
        return targets, residual

    t0 = time.time()
    targets, residual = run()
    compile_time = time.time() - t0
    print(f"compile+first run: {compile_time:.1f}s, targets {targets.shape} "
          f"residual {residual.shape}", file=sys.stderr)

    audio_sec = batch * t_wav / sr

    def run_pipelined_stream(n: int) -> float:
        """Production-stream throughput: a server drains a request QUEUE, so
        request i+1's (async) dispatch overlaps request i's completion and
        the per-request relay sync (~25 ms RTT here) is off the critical
        path. Each request is still the identical exact-semantics program
        chain; only the host sync is one request behind. Returns seconds
        per request amortized over the stream."""
        t0 = time.time()
        prev = None
        for _ in range(n):
            _, _, csum = run_async()
            if prev is not None:
                float(prev)
            prev = csum
        float(prev)
        return (time.time() - t0) / n

    if pipelined:
        avg = p50 = run_pipelined_stream(iters)
        stream_s = p50
    else:
        times = []
        for _ in range(iters):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        avg = float(np.mean(times))
        p50 = float(np.median(times))
        # Also measure the sustained request-stream rate with the SAME
        # compiled programs (costs `iters` extra dispatches) so the driver
        # artifact records both serving numbers: per-request latency
        # (the headline `value`) and loaded-server throughput.
        stream_s = run_pipelined_stream(iters)
    throughput = audio_sec / p50  # median: robust to relay-RPC outliers
    stream_x = audio_sec / stream_s
    print(
        f"per-batch p50 {p50*1000:.0f} ms (mean {avg*1000:.0f} ms) for "
        f"{audio_sec:.0f}s audio at k={candidates} -> {throughput:.2f}x "
        f"realtime/chip; pipelined stream {stream_s*1000:.0f} ms/req -> "
        f"{stream_x:.2f}x",
        file=sys.stderr,
    )
    mode = ("int8" if int8 else "int4" if int4 else "exact") + \
        (f"+preview{preview_nfe}" if preview_nfe else "") + \
        ("+visual" if visual else "")
    extras = {
        "mode": mode,
        "ranker_on_device": ranker,
        "k": candidates,
        "pipelined_stream_x": round(stream_x, 3),
    }
    # ---- fail-safe, time-budgeted extras --------------------------------
    # Each extra is gated on the time REMAINING in the bench budget minus an
    # expected-compile ALLOWANCE (the gate used to be checked only before the
    # compile started, so a cold 200-300 s relay compile could blow straight
    # past it — ADVICE r3). Warm runs (the driver reruns programs this round
    # already compiled) clear every gate; a cold run skips extras instead of
    # overrunning the driver window. Every extra is wrapped so the headline
    # JSON line is never at risk.
    budget_s = float(os.environ.get("SAM_AUDIO_BENCH_BUDGET_S", 780.0))
    deadline = _t_start + budget_s
    # Allowances are sized for a COLD relay compile (~250-300 s for a full
    # generation program). When the headline compile came back warm (the
    # relay caches compiles server-side within a round), the extras' compiles
    # will be warm too — scale the allowances by the measured headline
    # compile so a warm run fits every extra inside the budget.
    compile_scale = min(1.0, max(0.4, compile_time / 250.0))

    def _extra(name, allowance_s, fn):
        allowance_s *= compile_scale
        if time.time() > deadline - allowance_s:
            print(f"{name} extra skipped: < {allowance_s:.0f}s of budget left",
                  file=sys.stderr)
            return
        try:
            fn()
        except Exception as e:  # pragma: no cover - extras must never kill
            print(f"{name} extra skipped: {e}", file=sys.stderr)

    run_extras = (candidates > 1 and not visual and not preview_nfe
                  and not pipelined and not int8 and not int4)

    def _k1_extra():
        def run_k1():
            _, _, csum = step_final(params, None, noise[:batch])
            float(csum)

        t0 = time.time()
        run_k1()
        print(f"k=1 extra: compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr)
        k1 = []
        for _ in range(iters):
            t0 = time.time()
            run_k1()
            k1.append(time.time() - t0)
        extras["k1_p50_ms"] = round(float(np.median(k1)) * 1000, 1)
        print(f"k=1 p50 {extras['k1_p50_ms']:.0f} ms", file=sys.stderr)

    def _judge_extra():
        # secondary on-device scorer on the record (VERDICT r3 weak #5): the
        # full judge stack (ModernBERT + DAC-VAE encoder + 2x PE-AV towers,
        # reference judge.py:90-132) replaces CLAP in the second dispatch;
        # generation program is reused as-is.
        from sam_audio_tpu.config import SAMAudioJudgeConfig
        from sam_audio_tpu.models.judge import judge_forward_grouped, judge_init

        jcfg = SAMAudioJudgeConfig()
        j_aux = _gen_random_like(
            lambda k: judge_init(k, jcfg, jnp.bfloat16), jax.random.PRNGKey(8)
        )
        j_ids = jnp.asarray(
            ByteFallbackTokenizer(jcfg.text_model.vocab_size)(descriptions)[0]
        )

        @jax.jit
        def step_score_judge(params, j_aux, latents, targets):
            out = judge_forward_grouped(
                j_aux, jcfg, input_ids=j_ids, input_values=audios,
                separated_values=targets[:, None, :], k=candidates,
                compute_dtype=compute_dtype,
            )
            scores = out.overall.reshape(batch, candidates)
            idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            chosen = gather_candidates(latents, idxs, cfg=cfg,
                                       candidates=candidates)
            residual = decode_channel(params, chosen, cfg=cfg, channel=1)
            return residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

        def run_judge():
            latents, targets = step_gen(params, None, noise)
            _, csum = step_score_judge(params, j_aux, latents, targets)
            float(csum)

        t0 = time.time()
        run_judge()
        print(f"judge extra: compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            run_judge()
            ts.append(time.time() - t0)
        p50j = float(np.median(ts))
        extras["judge_p50_ms"] = round(p50j * 1000, 1)
        extras["judge_x"] = round(audio_sec / p50j, 3)
        print(f"judge rerank p50 {p50j*1000:.0f} ms -> {audio_sec/p50j:.2f}x",
              file=sys.stderr)

    def _visual_extra():
        # reference-faithful exact visual pipeline (VERDICT r4 next-step #2):
        # PE-Core ViT-L over 1 frame per latent frame @336^2 conditioning
        # the generation (reference model.py:186-191) AND the ImageBind
        # visual rerank — the reference reranks visual runs with
        # `visual_ranker` (ImageBind) FIRST (reference model.py:306-313).
        # r4's recorded number paid the cheaper CLAP scorer (~9 ms) instead
        # of ImageBind (~80 ms); this is the like-for-like number.
        from sam_audio_tpu.models.imagebind import (
            ImageBindConfig,
            ImageBindHugeConfig,
            audio_to_melclips_jax,
            imagebind_encode_audio,
            imagebind_encode_vision,
            imagebind_huge_init,
            video_to_frame_clips,
        )
        from sam_audio_tpu.models.pe_clip import encode_images, pe_clip_init
        from sam_audio_tpu.ops.resample import resample

        vcfg = cfg.vision_encoder
        pe_aux2 = _gen_random_like(
            lambda k: pe_clip_init(k, vcfg, jnp.bfloat16),
            jax.random.PRNGKey(11),
        )
        pe_frames2 = jax.jit(
            lambda k: jax.random.normal(
                k, (batch * t_frames, 3, vcfg.image_size, vcfg.image_size),
                jnp.bfloat16) * 0.5
        )(jax.random.PRNGKey(12))

        ib_cfg = ImageBindHugeConfig()
        pipe_cfg = ImageBindConfig()
        ib_aux = _gen_random_like(
            lambda k: imagebind_huge_init(k, ib_cfg, jnp.bfloat16),
            jax.random.PRNGKey(13),
        )
        frames_u8 = np.random.RandomState(14).randint(
            0, 255, (batch, t_frames, 3, 224, 224)).astype(np.uint8)
        ib_clips = jnp.asarray(np.stack([
            video_to_frame_clips(frames_u8[i], num_clips=5,
                                 frames_per_clip=ib_cfg.vision_frames,
                                 size=ib_cfg.image_size, num_crops=3)
            for i in range(batch)
        ]))

        @jax.jit
        def step_vision_x(pe_aux2):
            feats = encode_images(pe_aux2, pe_frames2, vcfg,
                                  compute_dtype=compute_dtype)
            return jnp.swapaxes(
                feats.reshape(batch, t_frames, -1), 1, 2).astype(jnp.float32)

        @jax.jit
        def step_gen_vis(params, video_features, noise):
            latents = separate_latents(
                params, audios, text_ids, text_mask, anchor_ids,
                anchor_alignment, audio_pad_mask, noise, video_features,
                cfg=cfg, candidates=candidates, use_video=True,
            )
            targets = decode_channel(params, latents, cfg=cfg, channel=0)
            return latents, targets

        @jax.jit
        def step_score_ib(params, ib_aux, latents, targets):
            # ImageBind visual rerank: ViT-H vision tower on the prompt
            # clips + audio ViT on each candidate's mel clips, cosine per
            # candidate (reference ranking/imagebind.py:174-197)
            v_emb = imagebind_encode_vision(ib_aux, ib_cfg, ib_clips,
                                            compute_dtype)
            wav16 = resample(targets.astype(jnp.float32), sr,
                             pipe_cfg.sample_rate)
            mels = audio_to_melclips_jax(wav16, pipe_cfg)
            a_emb = imagebind_encode_audio(ib_aux, ib_cfg, mels,
                                           compute_dtype)
            scores = jnp.einsum(
                "bkd,bd->bk", a_emb.reshape(batch, candidates, -1), v_emb)
            idxs = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            chosen = gather_candidates(latents, idxs, cfg=cfg,
                                       candidates=candidates)
            residual = decode_channel(params, chosen, cfg=cfg, channel=1)
            return residual, jnp.sum(residual[:, ::7919].astype(jnp.float32))

        def run_visual():
            vf = step_vision_x(pe_aux2)
            latents, targets = step_gen_vis(params, vf, noise)
            _, csum = step_score_ib(params, ib_aux, latents, targets)
            float(csum)

        t0 = time.time()
        run_visual()
        print(f"visual extra: compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            run_visual()
            ts.append(time.time() - t0)
        p50v = float(np.median(ts))
        extras["visual_exact_x"] = round(audio_sec / p50v, 3)
        extras["visual_rerank"] = "imagebind"
        print(f"visual exact (PE tower + ImageBind rerank) p50 "
              f"{p50v*1000:.0f} ms -> {audio_sec/p50v:.2f}x", file=sys.stderr)

    def _int8_probe():
        # flagship-scale quantization accuracy, measured on chip (VERDICT r3
        # weak #6): exact vs int8 decoded-target agreement on the 1B model.
        from sam_audio_tpu.ops.quant import quantize_sam_audio_params

        q_params = jax.jit(quantize_sam_audio_params)(params)
        lat_e, tgt_e = step_gen(params, None, noise)
        lat8, tgt8 = step_gen(q_params, None, noise)

        @jax.jit
        def _agree(a, b):
            a = a.astype(jnp.float32).reshape(-1)
            b = b.astype(jnp.float32).reshape(-1)
            a = a - jnp.mean(a)
            b = b - jnp.mean(b)
            corr = jnp.sum(a * b) * jax.lax.rsqrt(
                jnp.sum(a * a) * jnp.sum(b * b) + 1e-30)
            snr = 10.0 * jnp.log10(
                jnp.sum(a * a) / (jnp.sum(jnp.square(a - b)) + 1e-30))
            return corr, snr

        t0 = time.time()
        corr, snr = _agree(tgt_e, tgt8)
        corr, snr = float(corr), float(snr)
        extras["int8_target_corr"] = round(corr, 5)
        extras["int8_target_snr_db"] = round(snr, 2)
        print(f"int8 probe ({time.time()-t0:.1f}s): target corr {corr:.5f}, "
              f"SNR {snr:.2f} dB vs exact (same noise)", file=sys.stderr)

    def _streaming_extra():
        # long-audio story in the driver artifact (VERDICT r4 next-step #6):
        # a 60 s clip through streaming.py windows (bw=1, k=1) — the code
        # path separate() auto-dispatches to past max_direct_seconds and the
        # server routes long requests through (long_policy=stream).
        from sam_audio_tpu.models.sam_audio import SAMAudio
        from sam_audio_tpu.streaming import separate_streaming

        model = SAMAudio(cfg, params, tokenizer=tok,
                         allow_random_towers=True)
        stream_sec = 60.0
        long_wav = (np.random.RandomState(15)
                    .randn(int(stream_sec * sr)).astype(np.float32) * 0.1)

        def run_stream():
            res = separate_streaming(model, descriptions[0], long_wav,
                                     window_s=10.0, reranking_candidates=1,
                                     rng=jax.random.PRNGKey(2))
            return res.num_windows

        t0 = time.time()
        nw = run_stream()
        print(f"streaming extra: compile+first run {time.time()-t0:.1f}s "
              f"({nw} windows)", file=sys.stderr)
        ts = []
        for _ in range(2):
            t0 = time.time()
            run_stream()
            ts.append(time.time() - t0)
        p50s = float(np.median(ts))
        extras["streaming_x"] = round(stream_sec / p50s, 3)
        print(f"streaming 60s bw=1 k=1: {p50s*1000:.0f} ms -> "
              f"{stream_sec/p50s:.2f}x", file=sys.stderr)

    def _server_extra():
        # online-serving story in the driver artifact (VERDICT r4 weak #7):
        # sustained k=1 throughput through the REAL ContinuousBatcher
        # (admission queue -> coalescing -> single device thread), the same
        # stack SeparationServer serves HTTP from. mb_server.py is the full
        # probe (incl. HTTP transport); this records the batcher number.
        import threading

        from sam_audio_tpu.models.sam_audio import SAMAudio
        from sam_audio_tpu.server import ContinuousBatcher
        from sam_audio_tpu.serving import SeparationRequest

        model = SAMAudio(cfg, params, tokenizer=tok,
                         allow_random_towers=True)
        t_wav = (int(audio_sec * sr) // model.hop_length) * model.hop_length
        rng = np.random.RandomState(16)

        def reqs(n):
            return [SeparationRequest(
                descriptions[0],
                audio=(rng.randn(1, t_wav) * 0.1).astype(np.float32))
                for _ in range(n)]

        batcher = ContinuousBatcher(model, max_batch=1,
                                    bucket_seconds=audio_sec,
                                    max_wait_ms=25.0, reranking_candidates=1)
        try:
            t0 = time.time()
            batcher.separate(reqs(1)[0], timeout=1800)  # warm/compile
            print(f"server extra: warm/compile {time.time()-t0:.1f}s",
                  file=sys.stderr)
            n = 12
            futs = []
            lock = threading.Lock()
            pending = reqs(n)

            def client():
                while True:
                    with lock:
                        if not pending:
                            return
                        r = pending.pop()
                    futs.append(batcher.submit(r))

            t0 = time.perf_counter()
            clients = [threading.Thread(target=client) for _ in range(4)]
            for c in clients:
                c.start()
            for c in clients:
                c.join()
            for f in list(futs):
                f.result(timeout=600)
            wall = time.perf_counter() - t0
            extras["server_sustained_x"] = round(n * audio_sec / wall, 3)
            print(f"server sustained k=1: {n} reqs in {wall:.1f}s -> "
                  f"{n*audio_sec/wall:.2f}x realtime/chip", file=sys.stderr)
        finally:
            batcher.shutdown()

    if run_extras:
        # Order by VERDICT priority: the reference-faithful exact-visual
        # number (r4 next-step #2) and the secondary on-device scorer must
        # make the driver artifact; the streaming probe (r4 next-step #6),
        # k=1, the int8 accuracy probe, and the serving probe follow.
        _extra("judge", 350.0, _judge_extra)
        _extra("visual", 450.0, _visual_extra)
        _extra("streaming", 300.0, _streaming_extra)
        _extra("k=1", 250.0, _k1_extra)
        _extra("int8-probe", 250.0, _int8_probe)
        _extra("server", 200.0, _server_extra)
    print(json.dumps({
        "metric": "audio_sec_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "audio_sec/sec",
        "vs_baseline": round(throughput / 8.0, 3),
        "p50_ms": round(p50 * 1000, 1),
        "extras": extras,
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-k", "--candidates", type=int, default=8)
    ap.add_argument("-s", "--seconds", type=float, default=10.0)
    ap.add_argument("-b", "--batch", type=int, default=1)
    ap.add_argument("-n", "--iters", type=int, default=5)
    ap.add_argument("--preview-nfe", type=int, default=0,
                    help="opt-in fast-rerank mode (see separate(preview_nfe=))")
    ap.add_argument("--int8", action="store_true",
                    help="opt-in int8 DiT serving mode (SAMAudio.quantize())")
    ap.add_argument("--split3", action="store_true",
                    help="experiment: also split ODE and decode into separate "
                         "dispatches (3 programs total)")
    ap.add_argument("--fused-scorer", action="store_true",
                    help="compile the scorer+rerank INTO the generation "
                         "program instead of dispatching it second (measured "
                         "SLOWER: XLA scheduling interference costs ~56 ms at "
                         "k=8 CLAP — the split default matches production "
                         "separate(); outputs identical)")
    ap.add_argument("--visual-stride", type=int, default=1,
                    help="opt-in fast visual mode: encode every Nth frame "
                         "through the PE tower and linearly interpolate the "
                         "conditioning features (separate(visual_stride=))")
    ap.add_argument("--visual", action="store_true",
                    help="visual prompting: compile the PE-Core vision tower "
                         "(1 frame per latent frame @336^2) into the measured "
                         "step; pair with --ranker imagebind for the "
                         "reference's full visual pipeline")
    ap.add_argument("--ranker", choices=("clap", "judge", "imagebind",
                                         "energy"),
                    default="clap",
                    help="candidate scorer compiled into the measured step "
                         "(default: real CLAP tower, matching the reference's "
                         "in-separate reranking)")
    ap.add_argument("--pipelined", action="store_true",
                    help="measure a sustained request STREAM (server "
                         "semantics): overlap request i+1's dispatch with "
                         "request i's completion so the per-request relay "
                         "sync is off the critical path; reports stream "
                         "throughput (per-request latency is the sequential "
                         "default's p50)")
    ap.add_argument("--int4", action="store_true",
                    help="opt-in int4 weight-storage mode "
                         "(SAMAudio.quantize(bits=4); k=1 latency study)")
    args = ap.parse_args()
    if args.split3 and (args.preview_nfe or args.fused_scorer):
        ap.error("--split3 cannot combine with --preview-nfe/--fused-scorer "
                 "(the preview split path is 3 programs already)")
    if args.visual_stride != 1 and not args.visual:
        ap.error("--visual-stride requires --visual (it strides the PE "
                 "tower's frame encode)")
    main(args.candidates, args.seconds, args.batch, args.iters,
         args.preview_nfe, args.int8, args.ranker, args.int4,
         visual=args.visual,
         split_scorer=3 if args.split3 else not args.fused_scorer,
         visual_stride=args.visual_stride, pipelined=args.pipelined)
