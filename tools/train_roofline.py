"""Train-step roofline (VERDICT r4 item 5): component ablation of the
B=32 flagship Conformer train step, the way docs/streaming_roofline.md
decomposed the serving tick. Which term owns the non-encoder share of
the 34.7 ms step, and is 0.41 MFU a plateau or a bound?

Variants (each timed as K chained optimizer steps inside ONE jitted
scan, value-readback timing — bench.py rules):

  full        default step: fused encoder train kernels, hybrid
              CTC(0.3) + bidirectional attention loss, Adam + clip
  xla         fused train kernels off (encoder ablation)
  ctc_only    ctc_weight=1.0 — the attention decoder fwd+bwd drops out
              of the graph entirely (conformer.py __call__ skips
              _calc_att_loss)
  att_only    ctc_weight=0.0 — the CTC projection+loss drops out
  enc_only    grad of sum(encoder_out): encoder fwd+bwd + subsampling +
              optimizer, no heads at all
  enc_fwd     forward-only encoder (no grad) — splits fwd vs bwd
  opt_only    tx.update + apply_updates on frozen grads — optimizer +
              clip plumbing alone
  opt_fused   same, with the single-pass fused Adam
              (optimizer/fused.py) instead of the optax chain — prices
              the materialized-intermediate traffic the chain pays
  full_fused  the full step with the fused optimizer routed

Derived components (ms): decoder+att-loss = full − ctc_only;
ctc head+loss = full − att_only; encoder fwd+bwd ≈ enc_only − opt_only;
everything is measured at identical shapes so the subtractions are
honest to within run noise (~0.2 ms).

Run on the real TPU: python tools/train_roofline.py [--B 32] [--K 32]
Writes a markdown table to stdout; paste into docs/train_roofline.md.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # repo-root helpers: build/init_vars/xla_flops/chip peaks


def timed_scan(step_fn, state, batch0, rng, K):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def steps_k(state, batch, rng):
        def body(st, i):
            b = dict(batch)
            b["inputs"] = batch["inputs"] + 1e-6 * i.astype(jnp.float32)
            st, m = step_fn(st, b, jax.random.fold_in(rng, i))
            return st, m
        st, ms = jax.lax.scan(body, state, jnp.arange(K))
        return st, ms

    state, m = steps_k(state, batch0, rng)
    float(jax.tree.leaves(m)[0][-1])
    times = []
    for i in range(3):
        b = dict(batch0)
        b["inputs"] = batch0["inputs"] + jnp.float32(1e-5 * (i + 1))
        t0 = time.perf_counter()
        state, m = steps_k(state, b, rng)
        float(jax.tree.leaves(m)[0][-1])
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=1200)
    ap.add_argument("--K", type=int, default=32)
    args = ap.parse_args()

    import masr_tpu
    masr_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    from masr_tpu.optimizer.schedulers import build_optimizer
    from masr_tpu.training.train_state import (TrainState, make_train_step,
                                               train_rng)

    dev = jax.devices()[0]
    peak = bench.chip_peak_flops(dev)
    B, T, L = args.B, args.T, 30
    rs = np.random.RandomState(0)
    batch0 = {
        "inputs": jnp.asarray(rs.standard_normal((B, T, bench.FEAT)),
                              jnp.float32),
        "input_lens": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(rs.randint(2, bench.VOCAB_SIZE - 1, (B, L)),
                              jnp.int32),
        "label_lens": jnp.full((B,), L, jnp.int32)}
    rng = train_rng(0)

    def build_variant(ctc_weight=0.3, fused=True):
        enc = dict(bench.ENC, use_fused_layer=False,
                   use_fused_layer_train=fused)
        m = build_model(
            "conformer", bench.FEAT, bench.VOCAB_SIZE, streaming=True,
            encoder_conf=enc, decoder_conf=bench.DEC,
            model_conf=dict(ctc_weight=ctc_weight),
            cmvn=GlobalCMVN(np.zeros(bench.FEAT), np.ones(bench.FEAT)),
            dtype=jnp.bfloat16)
        v = jax.jit(m.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0),
             "chunk": jax.random.PRNGKey(0)},
            batch0["inputs"][:2], batch0["input_lens"][:2],
            batch0["labels"][:2], batch0["label_lens"][:2], train=True)
        return m, v

    OPT_CONF = {"optimizer": "Adam", "learning_rate": 1e-3,
                "weight_decay": 1e-6, "scheduler": "WarmupLR",
                "scheduler_conf": {"warmup_steps": 25000}}
    tx, _ = build_optimizer(OPT_CONF, grad_clip=5.0, accum_grad=1)
    tx_fused, _ = build_optimizer(dict(OPT_CONF, fused=True),
                                  grad_clip=5.0, accum_grad=1)

    rows = {}
    flops = None
    for name, kw in (("full", dict()),
                     ("xla", dict(fused=False)),
                     ("ctc_only", dict(ctc_weight=1.0)),
                     ("att_only", dict(ctc_weight=0.0))):
        m, v = build_variant(**kw)
        st = TrainState.create(m.apply, v["params"], tx,
                               v.get("batch_stats"))
        step = make_train_step(m, tx)
        if name == "xla":
            flops = bench.xla_flops(jax.jit(step), st, batch0, rng)
        rows[name] = timed_scan(step, st, batch0, rng, args.K) * 1e3
        print(f"# {name}: {rows[name]:.2f} ms/step", file=sys.stderr)

    # encoder-only fwd+bwd (+ optimizer): loss = mean(encoder_out)
    m, v = build_variant()
    st = TrainState.create(m.apply, v["params"], tx, v.get("batch_stats"))

    def enc_loss(params, batch, rng):
        d, c = jax.random.split(rng)
        out, _mask = m.apply(
            {"params": params}, batch["inputs"], batch["input_lens"],
            train=True, rngs={"dropout": d, "chunk": c},
            method=lambda mod, x, lens, train: mod.encoder(x, lens,
                                                           train=train))
        return jnp.mean(out.astype(jnp.float32))

    def enc_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(enc_loss)(state.params, batch, rng)
        updates, opt2 = state.tx.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt2), {"loss": loss}

    rows["enc_only"] = timed_scan(enc_step, st, batch0, rng, args.K) * 1e3
    print(f"# enc_only: {rows['enc_only']:.2f} ms/step", file=sys.stderr)

    # counted encoder fwd+bwd FLOPs (XLA route so the count is real):
    # prices the encoder's share of the model FLOPs for the bound
    # argument in docs/train_roofline.md
    m_x, v_x = build_variant(fused=False)

    def enc_loss_x(params, batch, rng):
        d, c = jax.random.split(rng)
        out, _mask = m_x.apply(
            {"params": params}, batch["inputs"], batch["input_lens"],
            train=True, rngs={"dropout": d, "chunk": c},
            method=lambda mod, x, lens, train: mod.encoder(x, lens,
                                                           train=train))
        return jnp.mean(out.astype(jnp.float32))

    def enc_step_x(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(enc_loss_x)(state.params, batch,
                                                     rng)
        updates, opt2 = state.tx.update(grads, state.opt_state,
                                        state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt2), {"loss": loss}

    st_x = TrainState.create(m_x.apply, v_x["params"], tx,
                             v_x.get("batch_stats"))
    flops_enc = bench.xla_flops(jax.jit(enc_step_x), st_x, batch0, rng)
    print(f"# enc counted FLOPs: {flops_enc / 1e12:.2f} T", file=sys.stderr)

    def enc_fwd_step(state, batch, rng):
        loss = enc_loss(state.params, batch,
                        jax.random.fold_in(rng, state.step))
        return state.replace(step=state.step + 1), {"loss": loss}

    rows["enc_fwd"] = timed_scan(enc_fwd_step, st, batch0, rng,
                                 args.K) * 1e3
    print(f"# enc_fwd: {rows['enc_fwd']:.2f} ms/step", file=sys.stderr)

    # optimizer-only: frozen grads through tx.update + apply_updates
    frozen = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, st.params)

    def opt_step(state, batch, rng):
        import optax
        g = jax.tree.map(
            lambda x: x * (1 + 1e-6 * batch["inputs"][0, 0, 0]), frozen)
        updates, opt2 = state.tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt2), {"loss": batch["inputs"].sum()}

    rows["opt_only"] = timed_scan(opt_step, st, batch0, rng, args.K) * 1e3
    print(f"# opt_only: {rows['opt_only']:.2f} ms/step", file=sys.stderr)

    # fused single-pass Adam: same frozen-grad probe on the fused tx —
    # isolates the optimizer form from everything else in the step
    st_f = TrainState.create(m.apply, v["params"], tx_fused,
                             v.get("batch_stats"))

    def opt_fused_step(state, batch, rng):
        import optax
        g = jax.tree.map(
            lambda x: x * (1 + 1e-6 * batch["inputs"][0, 0, 0]), frozen)
        updates, opt2 = state.tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt2), {"loss": batch["inputs"].sum()}

    rows["opt_fused"] = timed_scan(opt_fused_step, st_f, batch0, rng,
                                   args.K) * 1e3
    print(f"# opt_fused: {rows['opt_fused']:.2f} ms/step", file=sys.stderr)

    # full step with the fused optimizer routed end-to-end
    m2, v2f = build_variant()
    st_ff = TrainState.create(m2.apply, v2f["params"], tx_fused,
                              v2f.get("batch_stats"))
    rows["full_fused"] = timed_scan(make_train_step(m2, tx_fused), st_ff,
                                    batch0, rng, args.K) * 1e3
    print(f"# full_fused: {rows['full_fused']:.2f} ms/step",
          file=sys.stderr)

    full = rows["full"]
    mfu = (flops / (full / 1e3) / peak) if (flops and peak) else None
    print(f"\n## Train-step roofline, B={B}×{T / 100:.0f} s bf16 "
          f"({dev.device_kind}, K={args.K})\n")
    print("| variant | ms/step |")
    print("|---|---|")
    for k, v2 in rows.items():
        print(f"| {k} | {v2:.2f} |")
    print("\nDerived components (ms of the full step):\n")
    dec = full - rows["ctc_only"]
    ctc = full - rows["att_only"]
    enc = rows["enc_only"] - rows["opt_only"]
    print(f"- attention decoder fwd+bwd + att loss: {dec:.2f}")
    print(f"- CTC projection+loss: {ctc:.2f}")
    print(f"- encoder fwd+bwd (incl. subsampling): {enc:.2f}")
    print(f"-   of which encoder forward: {rows['enc_fwd']:.2f}")
    print(f"- optimizer + clip plumbing: {rows['opt_only']:.2f}")
    print(f"- residual (interactions/casts/metrics): "
          f"{full - dec - ctc - enc - rows['opt_only']:.2f}")
    if mfu:
        print(f"\nfull-step MFU {mfu:.4f} (XLA-counted {flops / 1e12:.2f} "
              f"TFLOP/step, fused kernels excluded from count — same math)")
        print(f"encoder share: {flops_enc / 1e12:.2f} TFLOP counted "
              f"({100 * flops_enc / flops:.0f}%); encoder-only MFU "
              f"{flops_enc / (rows['enc_only'] / 1e3) / peak:.3f}; with "
              f"staged-recompute FLOPs (~4/3×) hardware util "
              f"{flops_enc * 4 / 3 / (rows['enc_only'] / 1e3) / peak:.3f}")
    print(f"fused-vs-xla encoder ablation: {rows['xla']:.2f} → "
          f"{full:.2f} ms")
    if "opt_fused" in rows:
        print(f"optimizer chain vs fused single-pass: "
              f"{rows['opt_only']:.2f} → {rows['opt_fused']:.2f} ms "
              f"(full step {full:.2f} → {rows['full_fused']:.2f})")
        if mfu:
            print(f"full_fused MFU {flops / (rows['full_fused'] / 1e3) / peak:.4f}")


if __name__ == "__main__":
    main()
