"""Benchmark: streaming Conformer real-time factor per chip.

Measures the full-size streaming conformer chunk step (the predict_stream
hot path, SURVEY.md §3.5: 67 input frames → 16 encoder frames = 0.64 s of
audio per step, device-resident att/cnn caches) on the available
accelerator and reports real-time factor.

Baseline: the reference's streaming demo logs ~19–163 ms per 0.5 s chunk on
the author's GPU (docs/infer.md:134-150, BASELINE.md) — midpoint 91 ms ⇒
RTF ≈ 5.5×. `vs_baseline` is our_RTF / 5.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import masr_tpu
    masr_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN

    feat, vocab = 80, 4000
    enc = dict(output_size=256, attention_heads=4, linear_units=2048,
               num_blocks=12, cnn_module_kernel=15)
    dec = dict(attention_heads=4, linear_units=1024, num_blocks=3,
               r_num_blocks=3)
    model = build_model(
        "conformer", feat, vocab, streaming=True, encoder_conf=enc,
        decoder_conf=dec, model_conf=dict(ctc_weight=0.3),
        cmvn=GlobalCMVN(np.zeros(feat), np.ones(feat)))

    rng = jax.random.PRNGKey(0)
    window, chunk = 67, 16
    speech = jnp.asarray(
        np.random.RandomState(0).standard_normal((1, window, feat)),
        jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        speech, jnp.asarray([window]), jnp.ones((1, 4), jnp.int32),
        jnp.asarray([4]), train=False)

    cache_size = chunk * 16  # 16 left chunks ≈ 10 s of context
    init_state = model.apply(
        variables, method=lambda m: m.encoder.init_cache(
            batch=1, cache_size=cache_size))

    @jax.jit
    def step(variables, x, state):
        return model.apply(variables, x, state,
                           method=type(model).get_encoder_out_chunk)

    # scan K DISTINCT chunk steps on device — a real 5-minute stream in one
    # dispatch. K amortizes the per-call RTT of remote-execution tunnels,
    # and timing forces a host readback of the checksum: on this image's
    # axon tunnel, block_until_ready returns before execution finishes, so
    # only a value fetch gives honest wall-clock.
    K = 500
    xs = jnp.asarray(np.random.RandomState(1).standard_normal(
        (K, 1, window, feat)), jnp.float32)

    @jax.jit
    def stream(variables, xs, state):
        def body(st, x):
            probs, st = model.apply(variables, x, st,
                                    method=type(model).get_encoder_out_chunk)
            return st, jnp.sum(probs)  # checksum depends on every output
        st, out = jax.lax.scan(body, state, xs)
        return st, jnp.sum(out)

    # warmup/compile
    st, out = stream(variables, xs, init_state)
    float(out)

    # timed runs (checksum readback = sync point)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        st, out = stream(variables, xs, st)
        float(out)
        times.append((time.perf_counter() - t0) / K)
    per_chunk = float(np.median(times))
    audio_per_chunk = chunk * 4 * 0.01  # 16 frames × 40 ms = 0.64 s
    rtf = audio_per_chunk / per_chunk

    baseline_rtf = 5.5  # reference GPU streaming demo midpoint (BASELINE.md)
    print(json.dumps({
        "metric": "streaming_conformer_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / baseline_rtf, 3),
    }))
    print(f"# single-stream per-chunk latency: {per_chunk * 1000:.2f} ms for "
          f"{audio_per_chunk * 1000:.0f} ms audio; device: "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)

    # serving throughput: 32 concurrent streams per chip
    Bs = 32
    state_b = model.apply(
        variables, method=lambda m: m.encoder.init_cache(
            batch=Bs, cache_size=cache_size))
    xs_b = jnp.asarray(np.random.RandomState(2).standard_normal(
        (50, Bs, window, feat)), jnp.float32)
    st_b, out_b = stream(variables, xs_b, state_b)
    float(out_b)
    t0 = time.perf_counter()
    st_b, out_b = stream(variables, xs_b, st_b)
    float(out_b)
    step_b = (time.perf_counter() - t0) / 50
    print(f"# batched streaming: B={Bs}, {step_b * 1000:.2f} ms/step, "
          f"total {Bs * audio_per_chunk / step_b:.0f}x realtime/chip, "
          f"p50 chunk latency {step_b * 1000:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
