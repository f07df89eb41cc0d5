"""Benchmark: streaming Conformer serving + training on one chip.

Honest TPU numbers (VERDICT r1 item 4):
  (a) end-to-end predict_stream latency — PCM bytes in → partial text out,
      fused on-device frontend + incremental greedy decode included;
  (b) single-stream and batched (B=32/128) serving in bf16, full-context
      encode with the Pallas flash-attention path on/off;
  (c) MFU for the serving and training steps (XLA-counted FLOPs /
      wall-clock / chip bf16 peak).

Timing rules for this box (see CLAUDE.md): every timed iteration consumes
DISTINCT inputs (the axon tunnel dedups identical requests) and forces a
VALUE READBACK (`float(checksum)`) — `block_until_ready` returns early
through the tunnel.

Baseline: the reference's streaming demo logs ~19–163 ms per 0.5 s chunk
on the author's GPU (docs/infer.md:134-150, BASELINE.md) — midpoint 91 ms
⇒ RTF ≈ 5.5×. `vs_baseline` is our_RTF / 5.5.

Prints ONE JSON line (the only stdout line) with the headline metric
plus the auxiliary fields; human-readable detail goes to stderr.

Driver-window hardening (VERDICT r4 item 1 — BENCH_r04 died at rc=124
with no JSON): every metric is written into the summary dict AS IT IS
MEASURED and the JSON line is emitted from an atexit handler plus a
SIGTERM handler (`timeout` sends SIGTERM), so a partial run still
yields a parsed artifact (`"partial": true`). The default row set is
the headline one (single-stream, ring serving B=32/128, exact-positions
tick, train B=16/32, per-family B=32, e2e, device beam, predict_long);
the ablation rows (roll-cache, int8, multi-chunk k=4, flash-attention
variant, squeezeformer train A/B) run only under `--full`.
"""
import argparse
import atexit
import json
import os
import signal
import sys
import time

import numpy as np

SUMMARY = {"metric": "streaming_conformer_rtf", "value": None,
           "unit": "x_realtime_per_chip", "vs_baseline": None,
           "partial": True}
_EMITTED = False


def emit_summary():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(SUMMARY), flush=True)


def _sigterm(_signum, _frame):
    log("SIGTERM — emitting partial summary")
    emit_summary()
    os._exit(0)

FEAT, VOCAB_SIZE = 80, 4000
ENC = dict(output_size=256, attention_heads=4, linear_units=2048,
           num_blocks=12, cnn_module_kernel=15)
DEC = dict(attention_heads=4, linear_units=1024, num_blocks=3,
           r_num_blocks=3)
WINDOW, CHUNK = 67, 16
AUDIO_PER_CHUNK = CHUNK * 4 * 0.01  # 16 frames × 40 ms = 0.64 s

# bf16 peak TFLOPS per chip by device kind substring
_PEAKS = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12, "v5p": 459e12,
          "v5": 197e12, "v6 lite": 918e12, "v6e": 918e12, "v3": 123e12}


def chip_peak_flops(device):
    kind = device.device_kind.lower()
    for key, peak in _PEAKS.items():
        if key in kind:
            return peak
    return None


def xla_flops(jitted, *args, **kwargs):
    """XLA's own FLOP count for one execution, or None."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def log(msg):
    print(f"# {msg}", file=sys.stderr)


def build(dtype, use_flash=False, use_fused=True):
    import jax.numpy as jnp
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    enc = dict(ENC, use_flash_attention=use_flash, use_fused_layer=use_fused)
    return build_model(
        "conformer", FEAT, VOCAB_SIZE, streaming=True, encoder_conf=enc,
        decoder_conf=DEC, model_conf=dict(ctc_weight=0.3),
        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)),
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32)


def init_vars(model):
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    return jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, WINDOW, FEAT)), jnp.asarray([WINDOW]),
        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]), train=False)


def bench_stream_scan(model, variables, batch, K, fused=False,
                      pos_tables=True, tick_k=1,
                      ring=False, exact=False, count_flops=False):
    """Scanned chunk stream: K distinct steps in one dispatch →
    (per_step_s, flops_per_step). fused=True uses the batched fused
    chunk step (ops/pallas/chunk_layer.py) — the path the batched
    serving engine routes on TPU; it additionally supports per-slot
    offsets/validity (batch_stream.py).
    tick_k>1 benches MULTI-CHUNK ticks (k buffered windows per slot per
    dispatch, block-causal sub-chunk mask — engine tick_chunks knob):
    each step then covers k× the audio. ring=True benches the
    RING-buffer cache route (write only the fresh rows; the engine's
    default wherever eligible — docs/streaming_roofline.md r4 lever).
    exact=True runs the EXACT-POSITIONS program (per-tick sinusoid +
    einsum instead of the in-kernel position-table DMA — the route
    slots switch to past the table horizon; this row prices that
    cliff, VERDICT r4 item 4)."""
    import jax
    import jax.numpy as jnp
    cache_size = CHUNK * 16
    packed = None
    if fused:
        if ring:
            state = model.apply(
                variables, method=lambda m: m.encoder.init_cache(
                    batch=batch, cache_size=cache_size, ring=True))
        else:
            tmpl = model.apply(
                variables, method=lambda m: m.encoder.init_cache(
                    batch=1, cache_size=cache_size))
            state = jax.tree.map(lambda x: jnp.stack([x] * batch), tmpl)
        method = type(model).get_encoder_out_chunk_batched
        # pack ONCE with the per-layer position tables, exactly like the
        # serving engine (batch_stream.py) — repacking in-trace costs
        # ~60 MB of stacking traffic per tick
        packed = jax.device_put(model.apply(
            variables, cache_size if pos_tables else None,
            method=type(model).pack_chunk_params))
    else:
        state = model.apply(variables, method=lambda m: m.encoder.init_cache(
            batch=batch, cache_size=cache_size))
        method = type(model).get_encoder_out_chunk
    assert tick_k == 1 or fused, "multi-chunk ticks need the fused path"
    xshape = (K, batch, tick_k, WINDOW, FEAT) if tick_k > 1 \
        else (K, batch, WINDOW, FEAT)
    xs = jnp.asarray(np.random.RandomState(batch).standard_normal(
        xshape), jnp.float32)

    def _step(variables, x, st):
        if fused:
            return model.apply(variables, x, st, packed, None, exact,
                               method=method)
        return model.apply(variables, x, st, method=method)

    @jax.jit
    def stream(variables, xs, state):
        def body(st, x):
            probs, st = _step(variables, x, st)
            return st, jnp.sum(probs.astype(jnp.float32))
        st, out = jax.lax.scan(body, state, xs)
        return st, jnp.sum(out)

    # FLOPs must be counted on an UNSCANNED step: XLA's cost analysis
    # prices a While body once, not ×K, so counting the scan and
    # dividing by K under-reports by K (the r3/r4 "MFU 0.0006" serving
    # artifact — bench_full_context/bench_train_step always counted
    # unscanned twins, this helper didn't). Opt-in: it costs an extra
    # compile, and the fused routes' in-Pallas FLOPs are invisible to
    # the analysis anyway (callers reprice those from the XLA route).
    flops = None
    if count_flops:
        @jax.jit
        def one(variables, x, state):
            probs, st = _step(variables, x, state)
            return jnp.sum(probs.astype(jnp.float32))
        flops = xla_flops(one, variables, xs[0], state)
    st, out = stream(variables, xs, state)  # compile + warm
    float(out)
    times = []
    for i in range(4):
        # distinct inputs each run (tunnel dedup)
        xs_i = xs + jnp.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        st, out = stream(variables, xs_i, st)
        float(out)
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)), flops


def bench_full_context(model, variables, batch, T, K=16, runs=3):
    """Batched full-context encode (the serving `predict` path) →
    (per_batch_s, flops). K encodes run inside ONE jitted scan so the
    remote-tunnel round-trip (~40 ms/dispatch on this box) does not
    pollute the per-batch time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def encode_k(variables, x, lens):
        def body(c, i):
            probs, _ = model.apply(
                variables, x + 1e-6 * i.astype(jnp.float32), lens,
                method=type(model).get_encoder_out)
            return c + jnp.sum(probs.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c

    @jax.jit
    def encode_1(variables, x, lens):
        probs, _ = model.apply(variables, x, lens,
                               method=type(model).get_encoder_out)
        return jnp.sum(probs.astype(jnp.float32))

    lens = jnp.full((batch,), T, jnp.int32)
    x0 = jnp.asarray(np.random.RandomState(7).standard_normal(
        (batch, T, FEAT)), jnp.float32)
    flops = xla_flops(encode_1, variables, x0, lens)
    float(encode_k(variables, x0, lens))
    times = []
    for i in range(runs):
        x = x0 + jnp.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(encode_k(variables, x, lens))
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)), flops


def bench_e2e_stream(tmpdir):
    """predict_stream end to end: PCM bytes → partial text, fused
    frontend + greedy decode. → (p50_ms, p90_ms) per 0.64 s chunk call."""
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    model = build("f32")
    variables = init_vars(model)
    vocab = ["<blank>", "<unk>"] + [f"t{i}" for i in range(VOCAB_SIZE - 3)] \
        + ["<eos>"]
    save_inference_bundle(
        tmpdir, "conformer", True, FEAT, vocab, np.zeros(FEAT),
        np.ones(FEAT), ENC, DEC, dict(ctc_weight=0.3),
        {"feature_method": "fbank", "n_mels": FEAT,
         "use_dB_normalization": False}, jax.device_get(variables))
    p = MASRPredictor(tmpdir, decoder="ctc_greedy", warmup=False)
    assert p.fused_frontend
    sr = 16000
    rs = np.random.RandomState(3)
    step_samples = int(AUDIO_PER_CHUNK * sr)  # 0.64 s per call
    # prime: one full utterance (compiles the fused chunk program)
    wav = (rs.standard_normal(step_samples * 4) * 0.1).astype(np.float32)
    for i in range(0, len(wav), step_samples):
        p.predict_stream((wav[i:i + step_samples] * 32768).astype(
            np.int16).tobytes(), is_end=i + step_samples >= len(wav))
    p.reset_stream()
    # timed: 60 chunk calls of distinct audio
    lat = []
    for k in range(60):
        pcm = (rs.standard_normal(step_samples) * 0.1 * 32768).astype(
            np.int16).tobytes()
        t0 = time.perf_counter()
        r = p.predict_stream(pcm, is_end=False)
        lat.append(time.perf_counter() - t0)
        assert r is None or isinstance(r["text"], str)
    p.predict_stream(b"\x00\x00" * 160, is_end=True)
    p.reset_stream()
    lat = np.asarray(lat) * 1000
    return float(np.percentile(lat, 50)), float(np.percentile(lat, 90))


def bench_train_step(B=16, count_flops=True):
    """Full-size conformer train step, B × 12 s, bf16 AMP →
    (per_step_s, flops). Times the default (fused-layer) step; FLOPs are
    counted on the XLA-path variant (cost_analysis can't see inside
    Pallas kernels — same math either way; every term is linear in B so
    callers may scale a B=16 count instead of recompiling)."""
    import jax
    import jax.numpy as jnp
    from masr_tpu.optimizer.schedulers import build_optimizer
    from masr_tpu.training.train_state import TrainState, make_train_step
    model = build("bf16")
    variables = init_vars(model)
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": 1e-3, "weight_decay": 1e-6,
         "scheduler": "WarmupLR", "scheduler_conf": {"warmup_steps": 25000}},
        grad_clip=5.0, accum_grad=1)
    state = TrainState.create(model.apply, variables["params"], tx,
                              variables.get("batch_stats"))
    T, L = 1200, 30
    rs = np.random.RandomState(0)
    batch0 = {
        "inputs": jnp.asarray(rs.standard_normal((B, T, FEAT)), jnp.float32),
        "input_lens": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(rs.randint(2, VOCAB_SIZE - 1, (B, L)),
                              jnp.int32),
        "label_lens": jnp.full((B,), L, jnp.int32)}
    from masr_tpu.training.train_state import train_rng
    step_fn = make_train_step(model, tx)
    rng = train_rng(0)  # production RNG impl (rbg): see train_state.train_rng
    flops = None
    if count_flops:
        from masr_tpu.models.registry import build_model
        from masr_tpu.models.cmvn import GlobalCMVN
        enc_xla = dict(ENC, use_fused_layer=False,
                       use_fused_layer_train=False)
        model_x = build_model(
            "conformer", FEAT, VOCAB_SIZE, streaming=True,
            encoder_conf=enc_xla, decoder_conf=DEC,
            model_conf=dict(ctc_weight=0.3),
            cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)),
            dtype=jnp.bfloat16)
        step_x = make_train_step(model_x, tx)
        flops = xla_flops(jax.jit(step_x), state, batch0, rng)

    # K chained optimizer steps inside ONE jitted scan: per-step time is
    # free of the remote-tunnel dispatch RTT, matching how a real train
    # loop pipelines (async dispatch hides host latency). K=32 keeps the
    # ~40 ms RTT below 1.5 ms/step of pollution (K=8 added ~5 ms/step).
    K = 32

    @jax.jit
    def steps_k(state, batch, rng):
        def body(st, i):
            b = dict(batch)
            b["inputs"] = batch["inputs"] + 1e-6 * i.astype(jnp.float32)
            st, m = step_fn(st, b, jax.random.fold_in(rng, i))
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, jnp.arange(K))
        return st, jnp.sum(losses)

    state, s = steps_k(state, batch0, rng)
    float(s)
    times = []
    for i in range(3):
        batch = dict(batch0)
        batch["inputs"] = batch0["inputs"] + jnp.float32(1e-5 * (i + 1))
        t0 = time.perf_counter()
        state, s = steps_k(state, batch, rng)
        float(s)
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)), flops


def bench_sq_train_step(B=16):
    """Squeezeformer train step (layer_norm-conv config → fused TRAIN
    kernels, ops/pallas/squeezeformer_layer_train.py), B × 12 s bf16 AMP
    → (per_step_s, flops, fused_secs/xla_secs ablation). The reference
    default (batch_norm) keeps the XLA path; this row prices the fused
    lever on the config it exists for (VERDICT r3 item 6)."""
    import yaml
    import jax
    import jax.numpy as jnp
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.optimizer.schedulers import build_optimizer
    from masr_tpu.training.train_state import (TrainState, make_train_step,
                                               train_rng)
    with open("configs/squeezeformer.yml", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    def build_sq(fused):
        enc = dict(cfg.get("encoder_conf") or {})
        enc["cnn_norm_type"] = "layer_norm"
        enc["use_fused_layer_train"] = fused
        enc["use_fused_layer"] = False
        return build_model(
            "squeezeformer", FEAT, VOCAB_SIZE, streaming=True,
            encoder_conf=enc, decoder_conf=cfg.get("decoder_conf") or {},
            model_conf=dict(ctc_weight=0.3),
            cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)),
            dtype=jnp.bfloat16)

    T, L = 1200, 30
    rs = np.random.RandomState(0)
    batch0 = {
        "inputs": jnp.asarray(rs.standard_normal((B, T, FEAT)), jnp.float32),
        "input_lens": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(rs.randint(2, VOCAB_SIZE - 1, (B, L)),
                              jnp.int32),
        "label_lens": jnp.full((B,), L, jnp.int32)}
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": 1e-3, "weight_decay": 1e-6,
         "scheduler": "WarmupLR", "scheduler_conf": {"warmup_steps": 25000}},
        grad_clip=5.0, accum_grad=1)
    rng = train_rng(0)
    K = 32
    out = {}
    flops = None
    for key, fused in (("xla", False), ("fused", True)):
        model = build_sq(fused)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0),
             "chunk": jax.random.PRNGKey(0)},
            batch0["inputs"][:2], batch0["input_lens"][:2],
            batch0["labels"][:2], batch0["label_lens"][:2], train=True)
        state = TrainState.create(model.apply, variables["params"], tx,
                                  variables.get("batch_stats"))
        step_fn = make_train_step(model, tx)
        if key == "xla":
            flops = xla_flops(jax.jit(step_fn), state, batch0, rng)

        @jax.jit
        def steps_k(state, batch, rng):
            def body(st, i):
                b = dict(batch)
                b["inputs"] = batch["inputs"] + 1e-6 * i.astype(jnp.float32)
                st, m = step_fn(st, b, jax.random.fold_in(rng, i))
                return st, m["loss"]
            st, losses = jax.lax.scan(body, state, jnp.arange(K))
            return st, jnp.sum(losses)

        state, s = steps_k(state, batch0, rng)
        float(s)
        times = []
        for i in range(3):
            batch = dict(batch0)
            batch["inputs"] = batch0["inputs"] + jnp.float32(1e-5 * (i + 1))
            t0 = time.perf_counter()
            state, s = steps_k(state, batch, rng)
            float(s)
            times.append((time.perf_counter() - t0) / K)
        out[key] = float(np.median(times))
    return out, flops


def mfu(flops, secs, peak):
    if flops is None or peak is None or secs <= 0:
        return None
    return round(flops / secs / peak, 4)


def make_long_audio(minutes=2.0, sr=16000, seg_s=6.0, gap_s=0.5):
    """Synthetic long-form audio the silero VAD segments: alternating
    modulated-tone 'speech' spans and near-silence gaps."""
    rs = np.random.RandomState(11)
    total = int(minutes * 60 * sr)
    pieces = []
    n = 0
    while n < total:
        gap = (rs.standard_normal(int(gap_s * sr)) * 0.001).astype(
            np.float32)
        t = np.arange(int(seg_s * sr)) / sr
        f0 = 180 + 80 * rs.rand()
        speech = ((np.sin(2 * np.pi * f0 * t)
                   + np.sin(2 * np.pi * 2 * f0 * t)) * 0.3
                  * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
                  + rs.standard_normal(t.shape[0]) * 0.01)
        pieces += [gap, speech.astype(np.float32)]
        n += gap.shape[0] + speech.shape[0]
    return np.concatenate(pieces)[:total]


def bench_predict_long(tmpdir, minutes=2.0):
    """predict_long end to end on the chip: silero VAD segmentation
    (host) → duration-grouped batched full-context encode → greedy
    decode (VERDICT r4 item 7 — the bulk-transcription path the
    reference quotes eval wall-clock for, /root/reference/docs/eval.md).
    → (wall_s, audio_s, n_segments)."""
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    model = build("f32")
    variables = init_vars(model)
    vocab = ["<blank>", "<unk>"] + [f"t{i}" for i in range(VOCAB_SIZE - 3)] \
        + ["<eos>"]
    save_inference_bundle(
        tmpdir, "conformer", True, FEAT, vocab, np.zeros(FEAT),
        np.ones(FEAT), ENC, DEC, dict(ctc_weight=0.3),
        {"feature_method": "fbank", "n_mels": FEAT,
         "use_dB_normalization": False}, jax.device_get(variables))
    p = MASRPredictor(tmpdir, decoder="ctc_greedy", warmup=False)
    wav = make_long_audio(minutes=minutes)
    audio_s = wav.shape[0] / 16000.0
    # prime: a short slice compiles the batched-encode programs
    p.predict_long(make_long_audio(minutes=0.35))
    t0 = time.perf_counter()
    r = p.predict_long(wav)
    wall = time.perf_counter() - t0
    assert isinstance(r["text"], str)
    n_seg = len(p._vad.get_speech_timestamps(wav, 16000))
    return wall, audio_s, n_seg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true",
                    help="also run the ablation rows (roll-cache, int8, "
                         "multi-chunk k=4, flash attention, SQ train A/B)")
    ap.add_argument("--minutes", type=float, default=2.0,
                    help="predict_long synthetic audio length")
    args = ap.parse_args()
    signal.signal(signal.SIGTERM, _sigterm)
    atexit.register(emit_summary)
    t_start = time.time()

    import tempfile

    import masr_tpu
    masr_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    peak = chip_peak_flops(dev)
    SUMMARY["device"] = dev.device_kind
    log(f"device: {dev.device_kind}; bf16 peak: "
        f"{peak / 1e12 if peak else float('nan'):.0f} TFLOPS"
        f"{' (+ablation rows: --full)' if args.full else ''}")

    def sect(name):
        log(f"[{time.time() - t_start:.0f}s] === {name}")

    # ---- headline: single-stream streaming RTF, f32 (metric r1) ---- #
    sect("single-stream")
    model_f32 = build("f32")
    vars_f32 = init_vars(model_f32)
    per_chunk, chunk_flops = bench_stream_scan(model_f32, vars_f32,
                                               batch=1, K=500,
                                               count_flops=True)
    rtf = AUDIO_PER_CHUNK / per_chunk
    baseline_rtf = 5.5  # reference GPU streaming demo midpoint (BASELINE.md)
    SUMMARY["value"] = round(rtf, 2)
    SUMMARY["vs_baseline"] = round(rtf / baseline_rtf, 3)
    log(f"single-stream chunk step: {per_chunk * 1e3:.2f} ms "
        f"({rtf:.0f}x realtime, f32)")

    # ---- batched streaming serving (the engine's fused chunk step) -- #
    sect("batched serving")
    model_bf16 = build("bf16")
    vars_bf16 = init_vars(model_bf16)
    use_fused_chunk = False
    try:
        use_fused_chunk = bool(model_bf16.apply(
            vars_bf16, CHUNK, CHUNK * 16,
            method=type(model_bf16).chunk_fused_ok))
    except Exception:
        pass
    serving = {}
    for B in (32, 128):
        per_step = flops = None
        route = None
        # ring-buffer caches first (the engine's default where eligible),
        # then the roll-and-rewrite fused fallbacks, then vmapped
        for attempt in ((dict(fused=True, pos_tables=True, ring=True),
                         dict(fused=True, pos_tables=True),
                         dict(fused=True, pos_tables=False),
                         dict(fused=False)) if use_fused_chunk
                        else (dict(fused=False),)):
            try:
                per_step, flops = bench_stream_scan(
                    model_bf16, vars_bf16, batch=B, K=200, **attempt)
                route = "ring" if attempt.get("ring") else (
                    "fused" if attempt.get("fused") else "vmapped")
                break
            except Exception as e:
                log(f"serving B={B} {attempt} failed: {e}")
        if per_step is None:
            log(f"serving B={B}: every route failed — skipping")
            continue
        if route != "vmapped" and chunk_flops:
            # in-Pallas FLOPs are invisible to XLA's cost analysis —
            # price fused routes at B × the XLA-counted single-stream
            # chunk step (same chunk/cache math), the same XLA-route
            # pricing the family rows use
            flops = chunk_flops * B
        streams_rtf = B * AUDIO_PER_CHUNK / per_step
        serving[B] = dict(ms=per_step * 1e3, rtf=streams_rtf,
                          mfu=mfu(flops, per_step, peak), route=route)
        SUMMARY[f"serving_b{B}_rtf"] = round(streams_rtf, 1)
        SUMMARY[f"serving_b{B}_mfu"] = serving[B]["mfu"]
        SUMMARY.setdefault("serving_route", route)
        log(f"batched streaming B={B} (bf16, {route} chunk step): "
            f"{per_step * 1e3:.2f} ms/step, "
            f"{streams_rtf:.0f}x realtime/chip, MFU {serving[B]['mfu']}")
        # exact-positions program: the route ticks switch to past the
        # position-table horizon (per-tick sinusoid+einsum) — pricing
        # the horizon cliff (VERDICT r4 item 4)
        if route in ("ring", "fused"):
            try:
                pse, _ = bench_stream_scan(
                    model_bf16, vars_bf16, batch=B, K=200, fused=True,
                    pos_tables=True, ring=route == "ring", exact=True)
                SUMMARY[f"serving_b{B}_exact_ms"] = round(pse * 1e3, 2)
                SUMMARY[f"serving_b{B}_exact_rtf"] = round(
                    B * AUDIO_PER_CHUNK / pse, 1)
                log(f"batched streaming B={B} (bf16, {route}, "
                    f"exact-positions program): {pse * 1e3:.2f} ms/step, "
                    f"{B * AUDIO_PER_CHUNK / pse:.0f}x realtime/chip "
                    f"({pse / per_step:.2f}x the table route)")
            except Exception as e:
                log(f"exact-positions serving B={B} failed: {e}")
        if args.full and route == "ring":
            # roll-and-rewrite ablation alongside (the r3 default)
            try:
                ps2, _ = bench_stream_scan(model_bf16, vars_bf16, batch=B,
                                           K=200, fused=True,
                                           pos_tables=True)
                SUMMARY[f"serving_b{B}_roll_rtf"] = round(
                    B * AUDIO_PER_CHUNK / ps2, 1)
                log(f"batched streaming B={B} (bf16, roll-cache "
                    f"ablation): {ps2 * 1e3:.2f} ms/step, "
                    f"{B * AUDIO_PER_CHUNK / ps2:.0f}x realtime/chip")
            except Exception as e:
                log(f"roll ablation B={B} failed: {e}")

    if args.full and use_fused_chunk:
        sect("serving ablations (k=4)")
        # multi-chunk ticks (engine tick_chunks=k): k buffered windows
        # per slot in ONE dispatch
        TICK_K = 4
        multi_ok = False
        try:
            multi_ok = bool(model_bf16.apply(
                vars_bf16, CHUNK * TICK_K, CHUNK * 16,
                method=type(model_bf16).chunk_fused_ok))
        except Exception:
            pass
        for B in ((32, 128) if multi_ok else ()):
            per_step = None
            for rkw in (dict(ring=True), dict()):
                try:
                    per_step, _ = bench_stream_scan(
                        model_bf16, vars_bf16, batch=B, K=64, fused=True,
                        tick_k=TICK_K, **rkw)
                    break
                except Exception as e:
                    log(f"multi-chunk serving B={B} {rkw} unavailable: {e}")
            if per_step is None:
                break
            SUMMARY[f"serving_b{B}_k4_rtf"] = round(
                B * TICK_K * AUDIO_PER_CHUNK / per_step, 1)
            log(f"batched streaming B={B} (multi-chunk tick k={TICK_K}): "
                f"{per_step * 1e3:.2f} ms/step ({TICK_K} chunks), "
                f"{B * TICK_K * AUDIO_PER_CHUNK / per_step:.0f}x "
                f"realtime/chip")

    # ---- training steps (conformer, bf16 AMP) ---------------------- #
    sect("train steps")
    train_flops = None
    try:
        train_secs, train_flops = bench_train_step(B=16)
        SUMMARY["train_step_ms"] = round(train_secs * 1e3, 1)
        SUMMARY["train_mfu"] = mfu(train_flops, train_secs, peak)
        log(f"train step B=16×12 s (bf16 AMP): {train_secs * 1e3:.1f} "
            f"ms/step, MFU {SUMMARY['train_mfu']}")
    except Exception as e:
        log(f"train B=16 failed: {e}")
    try:
        train32_secs, _ = bench_train_step(B=32, count_flops=False)
        SUMMARY["train_b32_step_ms"] = round(train32_secs * 1e3, 1)
        SUMMARY["train_b32_mfu"] = mfu(
            2 * train_flops if train_flops else None, train32_secs, peak)
        log(f"train step B=32×12 s (bf16 AMP): {train32_secs * 1e3:.1f} "
            f"ms/step, MFU {SUMMARY['train_b32_mfu']}")
    except Exception as e:
        log(f"train B=32 failed: {e}")

    # ---- full-context encode (serving `predict`), conformer -------- #
    sect("full-context conformer")
    T_full = 1200  # 12 s utterances
    xla_flops_count = None
    fc_variants = [("xla", dict(use_fused=False)),
                   ("fused", dict(use_fused=True))]
    if args.full:
        fc_variants.append(("flash", dict(use_fused=False, use_flash=True)))
    for key, kw in fc_variants:
        try:
            model_fc = build("bf16", **kw)
            vars_fc = init_vars(model_fc)
            secs, flops = bench_full_context(model_fc, vars_fc, batch=32,
                                             T=T_full, K=64)
        except Exception as e:  # pallas needs a real TPU backend
            log(f"full-context {key} unavailable: {e}")
            continue
        if key == "xla":
            xla_flops_count = flops
        audio_s = 32 * T_full * 0.01
        SUMMARY[f"full_context_b32_rtf_{key}"] = round(audio_s / secs, 1)
        this_mfu = mfu(xla_flops_count, secs, peak)
        if key in ("fused", "xla"):
            SUMMARY["full_context_b32_mfu"] = this_mfu
        log(f"full-context encode B=32×12 s (bf16, {key}): "
            f"{secs * 1e3:.1f} ms, {audio_s / secs:.0f}x realtime, "
            f"MFU {this_mfu}")

    # ---- per-family full-context at the flagship batch ------------- #
    sect("families B=32")
    families = {}
    try:
        import yaml
        from masr_tpu.models.registry import build_model
        from masr_tpu.models.cmvn import GlobalCMVN

        def build_family(fam, cfg, **extra_enc):
            enc = dict(cfg.get("encoder_conf") or {})
            enc.update(extra_enc)
            m = build_model(
                fam, FEAT, VOCAB_SIZE, streaming=True, encoder_conf=enc,
                decoder_conf=cfg.get("decoder_conf") or {},
                model_conf=dict(ctc_weight=1.0) if fam == "deepspeech2"
                else dict(ctc_weight=0.3),
                cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)),
                dtype=jnp.bfloat16)
            vfam = jax.jit(m.init, static_argnames=("train",))(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0),
                 "chunk": jax.random.PRNGKey(0)},
                jnp.zeros((1, WINDOW, FEAT)), jnp.asarray([WINDOW]),
                jnp.ones((1, 4), jnp.int32), jnp.asarray([4]),
                train=False)
            return m, vfam

        B_FAM = 32
        for fam in ("squeezeformer", "efficient_conformer", "deepspeech2"):
            with open(f"configs/{fam}.yml", encoding="utf-8") as f:
                cfg = yaml.safe_load(f)
            audio_s = B_FAM * T_full * 0.01
            row = {}
            fam_flops = None
            variants = [("xla", dict(use_fused_layer=False)),
                        ("fused", {})] if fam != "deepspeech2" \
                else [("xla", {})]
            for key, extra in variants:
                try:
                    m, vfam = build_family(fam, cfg, **extra)
                    secs, flops = bench_full_context(m, vfam, batch=B_FAM,
                                                     T=T_full, K=32)
                except Exception as e:
                    log(f"{fam} {key} full-context unavailable: {e}")
                    continue
                if key == "xla":
                    fam_flops = flops
                row[key] = dict(ms=secs * 1e3, rtf=audio_s / secs,
                                mfu=mfu(fam_flops, secs, peak))
                log(f"full-context encode B={B_FAM}×12 s (bf16, {fam}, "
                    f"{key}): {secs * 1e3:.1f} ms, "
                    f"{audio_s / secs:.0f}x realtime, "
                    f"MFU {row[key]['mfu']}")
            best = row.get("fused") or row.get("xla")
            if best:
                families[fam] = {"rtf": round(best["rtf"], 1),
                                 "mfu": best["mfu"],
                                 "xla_rtf": (round(row["xla"]["rtf"], 1)
                                             if "xla" in row else None)}
                SUMMARY["family_b32"] = families
        # deepspeech2 is RNN-bound: 5 sequential LSTM layers keep the MXU
        # idle between tiny (B, 4·H)×(H, 4·H) steps — its MFU ceiling is
        # structural, not a tuning gap (docs/status.md)
    except Exception as e:
        log(f"family bench unavailable: {e}")

    # ---- squeezeformer batched streaming --------------------------- #
    sect("squeezeformer streaming")
    try:
        import yaml
        from masr_tpu.models.registry import build_model
        from masr_tpu.models.cmvn import GlobalCMVN
        with open("configs/squeezeformer.yml", encoding="utf-8") as f:
            sq_cfg = yaml.safe_load(f)
        m_sq = build_model(
            "squeezeformer", FEAT, VOCAB_SIZE, streaming=True,
            encoder_conf=sq_cfg.get("encoder_conf") or {},
            decoder_conf=sq_cfg.get("decoder_conf") or {},
            model_conf=dict(ctc_weight=0.3),
            cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)),
            dtype=jnp.bfloat16)
        v_sq = jax.jit(m_sq.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0),
             "chunk": jax.random.PRNGKey(0)},
            jnp.zeros((1, WINDOW, FEAT)), jnp.asarray([WINDOW]),
            jnp.ones((1, 4), jnp.int32), jnp.asarray([4]),
            train=False)
        fused_sq = False
        try:
            fused_sq = bool(m_sq.apply(v_sq, CHUNK, CHUNK * 16, 32,
                                       method=type(m_sq).chunk_fused_ok))
        except Exception:
            pass
        per_step = None
        if fused_sq:
            try:
                per_step, _ = bench_stream_scan(m_sq, v_sq, batch=32,
                                                K=100, fused=True)
            except Exception as e:
                log(f"sq fused chunk step failed, vmapped fallback: {e}")
                fused_sq = False
        if per_step is None:
            per_step, _ = bench_stream_scan(m_sq, v_sq, batch=32, K=100,
                                            fused=False)
        sq_rtf = 32 * AUDIO_PER_CHUNK / per_step
        SUMMARY["serving_sq_b32_rtf"] = round(sq_rtf, 1)
        SUMMARY["serving_sq_b32_fused"] = fused_sq
        log(f"batched streaming B=32 (squeezeformer, "
            f"{'fused' if fused_sq else 'vmapped'}): "
            f"{per_step * 1e3:.2f} ms/step, {sq_rtf:.0f}x realtime/chip")
    except Exception as e:
        log(f"squeezeformer streaming bench unavailable: {e}")

    # ---- e2e predict_stream (pcm→text) ----------------------------- #
    sect("e2e predict_stream")
    try:
        with tempfile.TemporaryDirectory() as td:
            p50_e2e, p90_e2e = bench_e2e_stream(td)
        SUMMARY["p50_e2e_ms"] = round(p50_e2e, 2)
        SUMMARY["p90_e2e_ms"] = round(p90_e2e, 2)
        log(f"e2e predict_stream per 0.64 s chunk: p50 {p50_e2e:.1f} ms, "
            f"p90 {p90_e2e:.1f} ms (pcm→text incl. fused fbank + greedy; "
            f"includes per-call dispatch transport — ~40 ms RTT through "
            f"this box's remote-TPU tunnel, sub-ms on a local chip)")
    except Exception as e:
        log(f"e2e stream bench failed: {e}")

    # ---- predict_long (VAD → batched encode → decode) -------------- #
    sect("predict_long")
    try:
        with tempfile.TemporaryDirectory() as td:
            wall, audio_s, n_seg = bench_predict_long(td,
                                                      minutes=args.minutes)
        SUMMARY["predict_long_rtf"] = round(audio_s / wall, 1)
        SUMMARY["predict_long_audio_s"] = round(audio_s, 1)
        log(f"predict_long {audio_s / 60:.1f} min synthetic audio "
            f"({n_seg} VAD segments): {wall:.2f} s wall = "
            f"{audio_s / wall:.0f}x realtime (host VAD + batched encode "
            f"+ greedy decode)")
    except Exception as e:
        log(f"predict_long bench failed: {e}")

    # ---- on-device batched beam search ----------------------------- #
    sect("device beam")
    try:
        from masr_tpu.decoders.device_beam import ctc_beam_search_jax
        Bd, Td = 128, 300
        rs = np.random.RandomState(0)
        lg = rs.standard_normal((Bd, Td, VOCAB_SIZE)).astype(np.float32)
        lg[np.arange(Bd)[:, None], np.arange(Td)[None, :],
           rs.randint(0, VOCAB_SIZE, (Bd, Td))] += 4
        e = np.exp(lg - lg.max(-1, keepdims=True))
        dprobs = jnp.asarray(e / e.sum(-1, keepdims=True))
        dlens = jnp.full((Bd,), Td, jnp.int32)
        _, _, sc = ctc_beam_search_jax(dprobs, dlens, beam_size=10,
                                       cutoff_top_n=40)
        float(jnp.sum(sc))
        tbs = []
        for i in range(3):
            t0 = time.perf_counter()
            _, _, sc = ctc_beam_search_jax(
                dprobs + jnp.float32(1e-7 * (i + 1)), dlens, beam_size=10,
                cutoff_top_n=40)
            float(jnp.sum(sc))
            tbs.append(time.perf_counter() - t0)
        beam_ms_utt = float(np.median(tbs)) / Bd * 1e3
        SUMMARY["device_beam_ms_per_utt"] = round(beam_ms_utt, 2)
        log(f"on-device batched beam search: {np.median(tbs) * 1e3:.0f} ms "
            f"for B={Bd}×{Td} frames (beam 10) = {beam_ms_utt:.2f} ms/utt")
    except Exception as e:
        log(f"device beam bench failed: {e}")

    # ---- squeezeformer train A/B (ablation) ------------------------ #
    if args.full:
        sect("squeezeformer train A/B")
        try:
            sq_secs, sq_flops = bench_sq_train_step(B=16)
            SUMMARY["sq_train_fused_ms"] = round(sq_secs["fused"] * 1e3, 1)
            SUMMARY["sq_train_xla_ms"] = round(sq_secs["xla"] * 1e3, 1)
            SUMMARY["sq_train_mfu"] = mfu(sq_flops, sq_secs["fused"], peak)
            log(f"squeezeformer train step B=16×12 s (layer_norm, fused): "
                f"{sq_secs['fused'] * 1e3:.1f} ms/step "
                f"(xla {sq_secs['xla'] * 1e3:.1f}), "
                f"MFU {SUMMARY['sq_train_mfu']}")
        except Exception as e:
            log(f"squeezeformer train bench unavailable: {e}")

    SUMMARY["partial"] = False
    SUMMARY["wall_s"] = round(time.time() - t_start, 1)
    log(f"bench complete in {SUMMARY['wall_s']:.0f}s")
    emit_summary()


if __name__ == "__main__":
    main()
