"""Dropout-noise distribution comparison (head-to-head mechanism hunt,
VERDICT r4 item 2): with LITERALLY identical weights (torch init
converted to flax) and one fixed batch, run the TRAIN-mode forward N
times under each framework's native dropout RNG and compare the loss
distributions. If the two implementations drop in the same places at
the same rates, the distributions must match (same mean shift vs the
deterministic eval loss, same spread); a systematic difference names an
implementation asymmetry (extra/missing site, wrong rate, wrong
scaling). Dynamic chunk is disabled so dropout is the ONLY stochastic
factor.

Run: python tools/dropout_stats.py [--n 200]
(The jax side is fine on CPU: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= .)
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from head_to_head import (ENC_CONF, DEC_CONF, MODEL_CONF, FEAT,  # noqa
                          build_reference_model, torch_init_to_flax,
                          make_corpus, featurize, build_vocab,
                          make_batches, write_mean_istd, _shim_reference)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--out", default="/tmp/dropout_stats")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import torch
    torch.set_num_threads(max(os.cpu_count() - 2, 1))

    train_s, _ = make_corpus(64, 8)
    feats = featurize(train_s, 0)
    vocab, c2i = build_vocab(train_s)
    mean_istd = write_mean_istd(feats, os.path.join(args.out,
                                                    "mean_istd.json"))
    batch = make_batches(feats, train_s, c2i)[0]

    t_model = build_reference_model(vocab, mean_istd, seed=17,
                                    no_dynamic_chunk=True)

    x = torch.from_numpy(batch["inputs"])
    xl = torch.from_numpy(batch["input_lens"])
    y = torch.from_numpy(batch["labels"])
    yl = torch.from_numpy(batch["label_lens"])

    # deterministic eval-mode baseline (dropout off) on both sides
    t_model.eval()
    with torch.no_grad():
        base_t = {k: float(v) for k, v in t_model(x, xl, y, yl).items()
                  if v is not None and k != "acc_att"}
    t_model.train()
    t_losses = {"loss": [], "loss_ctc": [], "loss_att": []}
    with torch.no_grad():
        for i in range(args.n):
            torch.manual_seed(10000 + i)
            out = t_model(x, xl, y, yl)
            for k in t_losses:
                t_losses[k].append(float(out[k]))

    # jax side from the SAME weights
    import json
    import jax
    import jax.numpy as jnp
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    with open(mean_istd, encoding="utf-8") as f:
        ms = json.load(f)
    enc_conf = dict(ENC_CONF)
    enc_conf["use_dynamic_chunk"] = False
    f_model = build_model(
        "conformer", FEAT, len(vocab), streaming=True,
        encoder_conf=enc_conf, decoder_conf=dict(DEC_CONF),
        model_conf=dict(MODEL_CONF),
        cmvn=GlobalCMVN(np.asarray(ms["mean"]), np.asarray(ms["istd"])))
    variables = jax.jit(f_model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
         "chunk": jax.random.PRNGKey(0)},
        jnp.asarray(batch["inputs"][:2]), jnp.asarray(batch["input_lens"][:2]),
        jnp.asarray(batch["labels"][:2]), jnp.asarray(batch["label_lens"][:2]),
        train=True)
    params = torch_init_to_flax(t_model, f_model, variables)

    @functools.partial(jax.jit, static_argnames=("train",))
    def run(params, key, train):
        return f_model.apply(
            {"params": params}, jnp.asarray(batch["inputs"]),
            jnp.asarray(batch["input_lens"]),
            jnp.asarray(batch["labels"], jnp.int32),
            jnp.asarray(batch["label_lens"]), train=train,
            rngs={"dropout": key, "chunk": jax.random.PRNGKey(0)})

    base_j = {k: float(v) for k, v in
              run(params, jax.random.PRNGKey(0), False).items()
              if k in ("loss", "loss_ctc", "loss_att")}
    j_losses = {"loss": [], "loss_ctc": [], "loss_att": []}
    for i in range(args.n):
        out = run(params, jax.random.PRNGKey(20000 + i), True)
        for k in j_losses:
            j_losses[k].append(float(out[k]))

    print(f"\nN={args.n} train-mode forwards, identical weights+batch, "
          f"dropout the only stochastic factor")
    print(f"{'':10s} {'torch eval':>11s} {'jax eval':>11s}   "
          f"{'torch mean±std':>18s}   {'jax mean±std':>18s}")
    report = {}
    for k in ("loss", "loss_ctc", "loss_att"):
        tv = np.asarray(t_losses[k])
        jv = np.asarray(j_losses[k])
        print(f"{k:10s} {base_t[k]:11.4f} {base_j[k]:11.4f}   "
              f"{tv.mean():9.4f}±{tv.std():7.4f}   "
              f"{jv.mean():9.4f}±{jv.std():7.4f}")
        report[k] = {"torch_eval": base_t[k], "jax_eval": base_j[k],
                     "torch_mean": float(tv.mean()),
                     "torch_std": float(tv.std()),
                     "jax_mean": float(jv.mean()),
                     "jax_std": float(jv.std())}
    import json as _json
    with open(os.path.join(args.out, "report.json"), "w") as f:
        _json.dump(report, f, indent=2)
    print(f"\nwritten to {args.out}/report.json")


if __name__ == "__main__":
    main()
