"""A/B microbench: fused batched chunk step with bf16 vs int8 KV caches
(ops/pallas/chunk_layer.py fused_chunk_layer vs fused_chunk_layer_q8) at
the production serving shape, plus a multi-tick numeric-drift check.

Run on real TPU:  python tools/bench_chunk_q8.py [B ...]
"""
import sys
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def bench_fixed_block(model, variables, B, block_b, pos_tables=True,
                      kv_int8=False, K=200):
    """12-layer tick with the slot block FORCED (isolates quant math
    from the block-size effect): scans K ticks of the raw per-layer
    kernels with packed weights, mirroring forward_chunk_batched."""
    import time
    import jax
    import jax.numpy as jnp
    from masr_tpu.ops.pallas.chunk_layer import (clamp_pos_starts,
                                                 fused_chunk_layer,
                                                 fused_chunk_layer_q8,
                                                 quantize_kv_cache)
    cache_size = bench.CHUNK * 16
    enc_apply = lambda meth, *a, **k: model.apply(
        variables, *a, method=meth, **k)
    packed = jax.device_put(model.apply(
        variables, cache_size if pos_tables else None,
        method=type(model).pack_chunk_params))
    H, KS = 4, 15
    D = 256
    c, C = bench.CHUNK, cache_size
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.standard_normal((B, bench.WINDOW, bench.FEAT)),
                     jnp.float32)
    emb = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: m.encoder.embed(
            m.encoder.cmvn(xx).astype(m.encoder.dtype)
            if m.encoder.cmvn is not None else xx.astype(m.encoder.dtype),
            None, 0, False)[0]))
    xe = emb(variables, x0)
    cache = jnp.zeros((12, B, H, C, 2 * (D // H)), jnp.bfloat16)
    cnn = jnp.zeros((12, B, KS - 1, D), jnp.bfloat16)
    clens = jnp.full((B,), C, jnp.int32)
    starts = clamp_pos_starts(jnp.full((B,), 512, jnp.int32), 8192, C + c)
    scale = None
    if kv_int8:
        cache, scale = quantize_kv_cache(cache)

    @jax.jit
    def tick(xe, cache, scale):
        new_c, new_s = [], []
        x = xe
        for i in range(12):
            p, _w, ptab = packed[i]
            if kv_int8:
                x, a, s, cn = fused_chunk_layer_q8(
                    x, None, cache[i], scale[i], cnn[i], clens, p, ptab,
                    starts, n_head=H, ksize=KS, block_b=block_b)
                new_s.append(s)
            else:
                x, a, cn = fused_chunk_layer(
                    x, None, cache[i], cnn[i], clens, p, None, ptab,
                    starts, n_head=H, ksize=KS, block_b=block_b)
            new_c.append(a)
        out = (jnp.stack(new_c), jnp.stack(new_s) if kv_int8 else scale)
        return jnp.sum(x.astype(jnp.float32)), out

    @jax.jit
    def scan_k(xe, cache, scale):
        def body(carry, i):
            c_, s_ = carry
            tot, (nc, ns) = tick(xe + 1e-6 * i.astype(jnp.float32), c_, s_)
            return (nc, ns), tot
        (c_, s_), tots = jax.lax.scan(body, (cache, scale),
                                      jnp.arange(K))
        return jnp.sum(tots)

    out = scan_k(xe, cache, scale)
    float(out)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = scan_k(xe + jnp.float32(1e-5 * (i + 1)), cache, scale)
        float(out)
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)), None


def main():
    import jax
    import jax.numpy as jnp
    import masr_tpu
    masr_tpu.enable_compilation_cache()

    bs = [int(a) for a in sys.argv[1:]] or [32, 128]
    model = bench.build("bf16")
    variables = bench.init_vars(model)
    ok = model.apply(variables, bench.CHUNK, bench.CHUNK * 16,
                     method=type(model).chunk_fused_ok)
    print(f"chunk_fused_ok: {ok}")

    from masr_tpu.ops.pallas.chunk_layer import pick_chunk_block_b
    for quant in (False, True):
        blk = pick_chunk_block_b(bench.CHUNK, bench.CHUNK * 16, 256, 2048,
                                 4, jnp.bfloat16, quant=quant)
        print(f"block_b ({'int8' if quant else 'bf16'}): {blk}")

    for B in bs:
        res = {}
        for name, kw in (("bf16/posp", dict(pos_tables=False)),
                         ("bf16/table", dict(pos_tables=True)),
                         ("ring/table", dict(pos_tables=True, ring=True)),
                         ("ring/posp", dict(pos_tables=False, ring=True)),
                         ("int8/posp", dict(pos_tables=False,
                                            kv_int8=True)),
                         ("int8/table", dict(pos_tables=True,
                                             kv_int8=True)),
                         ("bf16/table/k2", dict(pos_tables=True, tick_k=2,
                                                K=100)),
                         ("bf16/posp/k4", dict(pos_tables=False, tick_k=4,
                                               K=64)),
                         ("bf16/table/k4", dict(pos_tables=True, tick_k=4,
                                                K=64)),
                         ("ring/table/k4", dict(pos_tables=True, tick_k=4,
                                                ring=True, K=64)),
                         ("int8/posp/k4", dict(pos_tables=False, tick_k=4,
                                               kv_int8=True, K=64)),
                         ("int8/table/k4", dict(pos_tables=True, tick_k=4,
                                                kv_int8=True, K=64))):
            try:
                K = kw.pop("K", 200)
                tick_k = kw.get("tick_k", 1)
                t, _ = bench.bench_stream_scan(model, variables, batch=B,
                                               K=K, fused=True, **kw)
                res[name] = t / tick_k     # per-chunk-equivalent
                rtf = B * tick_k * bench.AUDIO_PER_CHUNK / t
                print(f"B={B} {name}: {t * 1e3:.2f} ms/step "
                      f"({rtf:.0f}x RT)")
            except Exception as e:
                print(f"B={B} {name}: FAILED — {e}")
        if "bf16/posp" in res and "int8/table" in res:
            print(f"B={B}: int8 total speedup "
                  f"{res['bf16/posp'] / res['int8/table']:.2f}x")
        if "bf16/table" in res and "ring/table" in res:
            print(f"B={B}: ring-cache speedup vs roll "
                  f"{res['bf16/table'] / res['ring/table']:.2f}x")
        # int8 vs bf16 at the SAME slot block isolates the in-kernel
        # quant/dequant cost from the block-size effect (VERDICT r3
        # item 2a: the unexplained B=32 int8 regression)
        for blk in (4,):
            for nm, kw in ((f"bf16/table/blk{blk}",
                            dict(pos_tables=True)),
                           (f"int8/table/blk{blk}",
                            dict(pos_tables=True, kv_int8=True))):
                try:
                    t, _ = bench_fixed_block(model, variables, B, blk,
                                             **kw)
                    res[nm] = t
                    print(f"B={B} {nm}: {t * 1e3:.2f} ms/step")
                except Exception as e:
                    print(f"B={B} {nm}: FAILED — {e}")
            a, b = f"bf16/table/blk{blk}", f"int8/table/blk{blk}"
            if a in res and b in res:
                print(f"B={B}: int8 quant-math overhead at equal block "
                      f"{res[b] / res[a]:.2f}x slower" if res[b] > res[a]
                      else f"B={B}: int8 wins at equal block "
                      f"{res[a] / res[b]:.2f}x")
        if "bf16/posp" in res and "bf16/table/k4" in res:
            print(f"B={B}: k=4 multi-chunk throughput gain "
                  f"{res['bf16/posp'] / res['bf16/table/k4']:.2f}x")
        if "bf16/posp" in res and "int8/table/k4" in res:
            print(f"B={B}: int8+k4 combined gain "
                  f"{res['bf16/posp'] / res['int8/table/k4']:.2f}x")

    # numeric drift over 30 chained ticks (distinct inputs per tick)
    cache_size = bench.CHUNK * 16
    tmpl0 = model.apply(variables, method=lambda m: m.encoder.init_cache(
        batch=1, cache_size=cache_size))
    tmpl8 = model.apply(variables, method=lambda m: m.encoder.init_cache(
        batch=1, cache_size=cache_size, kv_int8=True))
    N = 8
    st0 = jax.tree.map(lambda x: jnp.stack([x] * N), tmpl0)
    st8 = jax.tree.map(lambda x: jnp.stack([x] * N), tmpl8)
    rs = np.random.RandomState(0)
    step = jax.jit(lambda v, x, s: model.apply(
        v, x, s, method=type(model).get_encoder_out_chunk_batched))
    worst = 0.0
    for i in range(30):
        x = jnp.asarray(rs.standard_normal((N, 1, bench.WINDOW, bench.FEAT)),
                        jnp.float32)
        p0, st0 = step(variables, x, st0)
        p8, st8 = step(variables, x, st8)
        a0, a8 = np.asarray(p0, np.float32), np.asarray(p8, np.float32)
        worst = max(worst, float(np.max(np.abs(a0 - a8))))
        agree = float(np.mean(a0.argmax(-1) == a8.argmax(-1)))
        if i in (0, 9, 29):
            print(f"tick {i}: max |Δprob| {np.max(np.abs(a0 - a8)):.2e}, "
                  f"argmax agreement {agree:.4f}")
    print(f"worst |Δprob| over 30 ticks: {worst:.2e}")


if __name__ == "__main__":
    main()
