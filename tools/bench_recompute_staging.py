"""Price the train roofline's last named lever ON HARDWARE: replacing the
fused train kernels' backward recompute with HBM-staged activations
(docs/train_roofline.md "Bound statement").

The lever's largest term is the tiled FFN backward's replay of the first
FFN matmul (z = a @ w1, ~319 MFLOP per program at the production half-op
shape; two FFNs per layer — conformer_layer_train._ffn_bwd_tiled_masked).
This tool measures, at the production shape (T=304, D=256, F=2048,
grid=384 programs = B=32 x 12 layers), three pallas variants that do the
REAL backward-FFN work (dz = dh*dsilu(z); dw1/dw2 accumulation across the
grid; da) and differ only in where z comes from:

  bwd_recompute : z_t = a @ w1[:, tile] recomputed per column tile
                  (exactly the shipped kernel's replay)
  bwd_staged    : z arrives as a (T, F) bf16 input block written by the
                  forward (the read half of staging)
  fwd / fwd_stage : the forward-side cost — y = silu(a@w1) @ w2 with and
                  without the extra (T, F) bf16 z output (the write half)

net lever per FFN = (bwd_recompute - bwd_staged) - (fwd_stage - fwd);
the full train step has 2 FFN backwards per layer, so the step-level
delta is 2x the measured net.  The analytic model (train_roofline.md)
says the replay's arithmetic intensity (~128 FLOP/byte of staged
round-trip) sits AT the v5e balance point (~129), i.e. a wash; this
measurement decides.

Timing follows bench.py rules: K reps chained inside ONE jitted
lax.scan (the carry perturbs `a` so XLA cannot hoist the call), value
readback, per-iteration device cost reported.  Run on the chip:

    python tools/bench_recompute_staging.py [--K 32] [--iters 5]

CPU check of staged==recompute outputs (interpret mode):

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python tools/bench_recompute_staging.py --check
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D, F = 304, 256, 2048
GRID = 384                     # B=32 x 12 layers of half-op programs
FF_TILES = 4                   # matches conformer_layer_train.FF_TILES


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z):
    sg = jax.nn.sigmoid(z)
    return sg * (1.0 + z * (1.0 - sg))


def _mm(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_kernel(a_ref, df_ref, w1_ref, w2_ref, z_ref, da_ref, dw1_ref,
                dw2_ref, *, staged):
    """The tiled FFN backward of conformer_layer_train, z from either
    source. z_ref is None in the recompute variant."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    a = a_ref[0].astype(jnp.float32)
    df = df_ref[0].astype(jnp.float32)
    da = jnp.zeros((T, D), jnp.float32)
    tile = F // FF_TILES
    for t in range(FF_TILES):
        cs = slice(t * tile, (t + 1) * tile)
        if staged:
            z_t = z_ref[0][:, cs].astype(jnp.float32)
        else:
            z_t = _mm(a.astype(jnp.bfloat16), w1_ref[:, cs])
        h_t = _silu(z_t)
        dh_t = _mm_nt(df.astype(jnp.bfloat16), w2_ref[cs, :])
        dz_t = dh_t * _dsilu(z_t)
        dw1_ref[:, cs] += _mm_tn(a.astype(jnp.bfloat16),
                                 dz_t.astype(jnp.bfloat16))
        dw2_ref[cs, :] += _mm_tn(h_t.astype(jnp.bfloat16),
                                 df.astype(jnp.bfloat16))
        da = da + _mm(dz_t.astype(jnp.bfloat16),
                      jnp.swapaxes(w1_ref[:, cs], 0, 1))
    da_ref[0] = da.astype(da_ref.dtype)


def _fwd_kernel(a_ref, w1_ref, w2_ref, y_ref, z_ref, *, stage):
    z = _mm(a_ref[0], w1_ref[...])
    y = _mm(_silu(z).astype(jnp.bfloat16), w2_ref[...])
    y_ref[0] = y.astype(y_ref.dtype)
    if stage:
        z_ref[0] = z.astype(z_ref.dtype)


def _cspec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda b, _n=n: (0,) * _n)


def _bspec(shape):
    return pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1))


def build_bwd(staged, interpret):
    def call(a, df, w1, w2, z):
        in_specs = [_bspec((1, T, D)), _bspec((1, T, D)),
                    _cspec((D, F)), _cspec((F, D))]
        ops = [a, df, w1, w2]
        if staged:
            in_specs.append(_bspec((1, T, F)))
            ops.append(z)
        if staged:
            kern = functools.partial(_bwd_kernel, staged=True)
        else:                               # no z operand: splice in None
            def kern(*refs):
                return _bwd_kernel(*refs[:4], None, *refs[4:],
                                   staged=False)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((GRID, T, D), jnp.bfloat16),
                       jax.ShapeDtypeStruct((D, F), jnp.float32),
                       jax.ShapeDtypeStruct((F, D), jnp.float32)),
            grid=(GRID,),
            in_specs=in_specs,
            out_specs=(_bspec((1, T, D)), _cspec((D, F)), _cspec((F, D))),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*ops)
    return call


def build_fwd(stage, interpret):
    def call(a, w1, w2):
        outs = [jax.ShapeDtypeStruct((GRID, T, D), jnp.bfloat16)]
        out_specs = [_bspec((1, T, D))]
        if stage:
            outs.append(jax.ShapeDtypeStruct((GRID, T, F), jnp.bfloat16))
            out_specs.append(_bspec((1, T, F)))
        if stage:
            kern = functools.partial(_fwd_kernel, stage=True)
        else:                               # no z output: append None
            def kern(*refs):
                return _fwd_kernel(*refs, None, stage=False)
        return pl.pallas_call(
            kern,
            out_shape=tuple(outs),
            grid=(GRID,),
            in_specs=[_bspec((1, T, D)), _cspec((D, F)), _cspec((F, D))],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(a, w1, w2)
    return call


def _time_scan(step, a0, rest, K, iters):
    """ms per step: K chained reps inside one jit, carry perturbs the
    activation so the call cannot be hoisted; value readback. All
    operands MUST flow in through `rest` (a tuple of arrays) — arrays
    closed over by `step` would be serialized into the compile request
    as constants, which the axon tunnel rejects (HTTP 413)."""
    @jax.jit
    def run(a0, rest):
        def body(a, _):
            outs = step(a, rest)
            # feed a dependence back so iterations are sequential
            a = a + outs[0].astype(a.dtype) * jnp.bfloat16(1e-8)
            return a, outs[1]
        aK, accs = jax.lax.scan(body, a0, None, length=K)
        return jnp.float32(jnp.sum(aK[..., :1].astype(jnp.float32))) + \
            jnp.float32(accs[-1])
    float(run(a0, rest))                     # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(a0, rest))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    global GRID, FF_TILES
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiles", type=int, default=FF_TILES,
                    help="FFN column tiles (raise to 8 if the staged "
                         "variant overflows scoped VMEM)")
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode staged==recompute parity (CPU)")
    args = ap.parse_args()
    FF_TILES = args.tiles
    interpret = jax.default_backend() != "tpu"
    if interpret and not args.check:
        sys.exit("hardware pricing needs the TPU; use --check on CPU")

    key = jax.random.PRNGKey(0)
    ka, kd, k1, k2 = jax.random.split(key, 4)
    if args.check:
        GRID = 2
    a = (jax.random.normal(ka, (GRID, T, D), jnp.float32) * 0.5
         ).astype(jnp.bfloat16)
    df = (jax.random.normal(kd, (GRID, T, D), jnp.float32) * 0.5
          ).astype(jnp.bfloat16)
    w1 = (jax.random.normal(k1, (D, F), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (F, D), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)

    fwd = build_fwd(False, interpret)
    fwd_st = build_fwd(True, interpret)
    bwd_rc = build_bwd(False, interpret)
    bwd_st = build_bwd(True, interpret)

    if args.check:
        _, z = fwd_st(a, w1, w2)
        o_rc = bwd_rc(a, df, w1, w2, None)
        o_st = bwd_st(a, df, w1, w2, z)
        for n, x, y in zip(("da", "dw1", "dw2"), o_rc, o_st):
            d = float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                      - y.astype(jnp.float32))))
            r = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) + 1e-6
            print(f"{n}: max|recompute-staged| = {d:.3e} (rel {d/r:.2e})")
            assert d / r < 2e-2, n    # staged z is bf16-rounded once more
        print("staged == recompute: OK")
        return

    z = fwd_st(a, w1, w2)[1]

    def step_fwd(av, rest):
        w1_, w2_ = rest
        (y,) = fwd(av, w1_, w2_)
        return y, jnp.sum(y[..., :1].astype(jnp.float32))

    def step_fwd_st(av, rest):
        w1_, w2_ = rest
        y, zz = fwd_st(av, w1_, w2_)
        return y, jnp.sum(zz[..., :1].astype(jnp.float32))

    def step_bwd_rc(av, rest):
        df_, w1_, w2_ = rest
        da, dw1, dw2 = bwd_rc(av, df_, w1_, w2_, None)
        return da, jnp.sum(dw1[0]) + jnp.sum(dw2[0])

    def step_bwd_st(av, rest):
        df_, w1_, w2_, z_ = rest
        da, dw1, dw2 = bwd_st(av, df_, w1_, w2_, z_)
        return da, jnp.sum(dw1[0]) + jnp.sum(dw2[0])

    res = {}
    for name, st, rest in (("fwd", step_fwd, (w1, w2)),
                           ("fwd_stage", step_fwd_st, (w1, w2)),
                           ("bwd_recompute", step_bwd_rc, (df, w1, w2)),
                           ("bwd_staged", step_bwd_st, (df, w1, w2, z))):
        res[name] = _time_scan(st, a, rest, args.K, args.iters)
        print(f"{name:14s}: {res[name]:7.3f} ms / rep "
              f"({GRID} programs, T={T} D={D} F={F})")
    read_save = res["bwd_recompute"] - res["bwd_staged"]
    write_cost = res["fwd_stage"] - res["fwd"]
    net = read_save - write_cost
    print(f"staged-read saves {read_save:+.3f} ms; fwd write costs "
          f"{write_cost:+.3f} ms; NET per FFN {net:+.3f} ms "
          f"-> per train step (2 FFNs/layer) {2*net:+.3f} ms")


if __name__ == "__main__":
    main()
