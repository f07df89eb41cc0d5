"""Head-to-head CER parity run: the reference PyTorch MASR vs masr_tpu,
trained on the SAME synthetic corpus with the SAME features (VERDICT r2
item 2 — the strongest accuracy-parity evidence obtainable in a
zero-egress image, where AIShell itself is unreachable).

What is equalized and what is not:
- identical utterances, identical precomputed fbank features (our
  Kaldi-compatible numpy fbank, dither off, dB-norm on — both frameworks
  consume the same arrays, so the frontend is out of the equation),
- identical CMVN stats, vocab, architecture, loss weights, lr schedule
  (the reference's OWN WarmupLR class drives torch; ours drives JAX —
  the two are formula-tested identical in tests/test_schedulers.py),
  grad clip, batch assembly (duration-sorted, fixed order, no shuffle),
- NOT equalized: parameter init and dropout/dynamic-chunk RNG draws —
  each framework trains with its native random streams, which is exactly
  the reference's own published-results methodology (independent runs).

The torch side runs the reference's real model classes
(masr.model_utils.conformer.model.ConformerModel — forward → loss dict)
in a compact loop replicating its train semantics
(reference trainer.py:347-427: backward, clip_grad_norm_(5), per-step
scheduler; evaluation mirrors trainer.py:592-651). The I/O stack
(DataLoader workers, soundfile) is bypassed — features are injected —
because torchaudio/soundfile are absent here and equal features are the
point.

Decoding: both frameworks' CTC probs go through the SAME decoders (our
greedy + prefix beam), so decode is also out of the equation.

Usage:
  python tools/head_to_head.py --out /tmp/h2h [--epochs 60]
Writes <out>/report.json + <out>/loss_curves.jsonl; the committed
summary lives in docs/parity_report.md.
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR = 16000
FEAT = 80

# characters with distinct deterministic renderings (audio/synth_tts.py)
CHARS = list("你好天气真完我家业世界语音识别学习工作水火山石田土木金"
             "雨雪风云日月星光红绿蓝白黑大小多少上下左右")

# extended set for the hard (non-saturating) operating point: a denser
# formant space makes more char pairs acoustically confusable under noise
CHARS_HARD = CHARS + list("春夏秋冬东南西北前后里外高低长短远近快慢新旧"
                          "开关门窗车船飞机花草树林鸟鱼虫马牛羊猪狗猫"
                          "一二三四五六七八九十百千万亿年月周时分秒")

ENC_CONF = dict(output_size=48, attention_heads=2, linear_units=96,
                num_blocks=2, cnn_module_kernel=7, dropout_rate=0.1,
                attention_dropout_rate=0.0, positional_dropout_rate=0.1)
DEC_CONF = dict(attention_heads=2, linear_units=96, num_blocks=1,
                r_num_blocks=0, dropout_rate=0.1,
                positional_dropout_rate=0.1,
                self_attention_dropout_rate=0.0,
                src_attention_dropout_rate=0.0)
MODEL_CONF = dict(ctc_weight=0.3, lsm_weight=0.1, reverse_weight=0.0,
                  length_normalized_loss=False)
LR, WARMUP, CLIP = 2e-3, 300, 5.0


def make_corpus(n_train=320, n_test=48, seed=0, speakers=2,
                chars=None, len_lo=3, len_hi=7):
    """Deterministic sentences over the char set; test sentences are
    unseen sequences of seen characters."""
    chars = chars or CHARS
    rs = np.random.RandomState(seed)
    seen = set()
    sents = []
    while len(sents) < n_train + n_test:
        n = rs.randint(len_lo, len_hi)
        s = "".join(chars[i] for i in rs.randint(0, len(chars), n))
        if s not in seen:
            seen.add(s)
            sents.append(s)
    return sents[:n_train], sents[n_train:]


def _add_noise(wav, snr_db, rs):
    """Additive white noise at a controlled SNR vs the signal RMS —
    the difficulty dial for the non-saturating operating point. Applied
    to the waveform BEFORE fbank so both frameworks consume identical
    noisy features (SNR draws are deterministic per utterance)."""
    sig = np.sqrt(np.mean(np.square(wav)) + 1e-12)
    noise = rs.standard_normal(wav.shape[0]).astype(np.float32)
    noise *= float(sig / 10.0 ** (snr_db / 20.0))
    out = wav + noise
    peak = np.abs(out).max()
    return (out / peak * 0.95).astype(np.float32) if peak > 1 else out


def featurize(sents, seed_base, speakers=2, snr_db=None):
    """Render synthetic speech and fbank it (dither off → deterministic;
    identical arrays feed both frameworks). snr_db: None = clean,
    float = fixed SNR, (lo, hi) = per-utterance uniform draw
    (deterministic in the utterance text)."""
    import hashlib
    from masr_tpu.audio.synth_tts import SyntheticTTS
    from masr_tpu.data.audio_featurizer import AudioFeaturizer
    tts = SyntheticTTS(sample_rate=SR)
    feat = AudioFeaturizer(train=False, feature_method="fbank",
                           n_mels=FEAT, sample_rate=SR,
                           use_dB_normalization=True, target_dB=-20)
    out = []
    for i, s in enumerate(sents):
        wav = tts.render(s, spk_id=(seed_base + i) % speakers)
        if snr_db is not None:
            rs = np.random.RandomState(int.from_bytes(hashlib.md5(
                f"noise|{s}|{seed_base}".encode()).digest()[:4], "little"))
            snr = (rs.uniform(*snr_db) if isinstance(snr_db, tuple)
                   else float(snr_db))
            wav = _add_noise(wav, snr, rs)
        from masr_tpu.audio.segment import AudioSegment
        seg = AudioSegment(wav, SR)
        out.append(np.asarray(feat.featurize(seg), np.float32))
    return out


def build_vocab(train_sents):
    chars = sorted({c for s in train_sents for c in s})
    vocab = ["<blank>", "<unk>"] + chars + ["<eos>"]
    return vocab, {c: i for i, c in enumerate(vocab)}


def make_batches(feats, sents, c2i, batch_size=16):
    """Duration-sorted fixed batches, padded to the GLOBAL max shapes so
    the JAX side compiles one program. Labels pad with -1 (CTC ignore)."""
    order = np.argsort([f.shape[0] for f in feats])
    maxT = max(f.shape[0] for f in feats)
    maxL = max(len(s) for s in sents)
    batches = []
    for g in range(0, len(order), batch_size):
        idx = order[g:g + batch_size]
        if len(idx) < batch_size:     # pad the tail group (zero-len rows)
            idx = np.concatenate([idx, idx[:batch_size - len(idx)]])
            pad_from = len(order) - g
        else:
            pad_from = batch_size
        B = len(idx)
        x = np.zeros((B, maxT, FEAT), np.float32)
        xl = np.zeros((B,), np.int64)
        y = np.full((B, maxL), -1, np.int64)
        yl = np.zeros((B,), np.int64)
        for j, i in enumerate(idx):
            f, s = feats[i], sents[i]
            x[j, :f.shape[0]] = f
            xl[j] = f.shape[0]
            ids = [c2i.get(c, 1) for c in s]
            y[j, :len(ids)] = ids
            yl[j] = len(ids)
        if pad_from < B:              # duplicated rows count zero loss
            xl[pad_from:] = 0
            yl[pad_from:] = 0
            y[pad_from:] = -1
        batches.append({"inputs": x, "input_lens": xl, "labels": y,
                        "label_lens": yl, "valid": pad_from})
    return batches


def write_mean_istd(feats, path):
    cat = np.concatenate(feats, axis=0)
    mean = cat.mean(axis=0)
    istd = 1.0 / np.maximum(cat.std(axis=0), 1e-20)
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"mean": mean.tolist(), "istd": istd.tolist()}, f)
    return path


# ------------------------------------------------------------------ #
# reference (PyTorch) side
# ------------------------------------------------------------------ #


def _shim_reference():
    for name in ["av", "soundfile", "resampy", "pydub", "zhconv", "tqdm",
                 "torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi"]:
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            mod.AudioSegment = object
            mod.convert = lambda *a, **k: a[0] if a else ""
            mod.mfcc = mod.fbank = None
            mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def build_reference_model(vocab, mean_istd_path, seed=17,
                          no_dynamic_chunk=False):
    """Reference ConformerModel with its native torch-seeded init (the
    same object train_reference builds — factored out so --same_init /
    --lockstep can snapshot the initial weights)."""
    import torch
    _shim_reference()
    from masr.model_utils.conformer.model import ConformerModel
    torch.manual_seed(seed)
    model = ConformerModel(
        input_dim=FEAT, vocab_size=len(vocab),
        mean_istd_path=mean_istd_path, streaming=True,
        encoder_conf=dict(ENC_CONF), decoder_conf=dict(DEC_CONF),
        **MODEL_CONF)
    if no_dynamic_chunk:
        # the flag is read per forward call, so post-construction
        # assignment is exact (reference encoder.py:327-338)
        model.encoder.use_dynamic_chunk = False
    return model


def torch_init_to_flax(t_model, f_model, f_variables):
    """Snapshot a torch ConformerModel's CURRENT weights into a flax
    param tree (the tests/test_convert_parity.py machinery) — the
    --same_init bisect starts both frameworks from literally identical
    numbers."""
    from masr_tpu.models.convert import (apply_converted,
                                         convert_conformer_family)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()
          if "global_cmvn" not in k}
    converted, misses = convert_conformer_family(
        sd, FEAT, ENC_CONF["output_size"])
    assert not misses, f"unmapped torch params: {misses[:5]}"
    # allow_extra: the reference instantiates a dead right_decoder
    # (embed/after_norm/output_layer) even at r_num_blocks=0; our flax
    # decoder doesn't — those tensors are loss-inert either way
    return apply_converted(f_variables["params"], converted, strict=True,
                           allow_extra=True)


def train_reference(batches, vocab, mean_istd_path, epochs, log, seed=17,
                    eval_fn=None, eval_every=0, no_dynamic_chunk=False,
                    model=None, step_losses=None):
    """The reference's ConformerModel + WarmupLR trained with the
    reference's step semantics (trainer.py:347-427). eval_fn(model) → CER
    every eval_every epochs implements the reference's own best-checkpoint
    selection (trainer.py:572-590 keeps best_model by test cer); the
    best state_dict is restored before returning."""
    import copy
    import torch
    torch.set_num_threads(max(os.cpu_count() - 2, 1))
    _shim_reference()
    from masr.optimizer.scheduler import WarmupLR
    if model is None:
        model = build_reference_model(vocab, mean_istd_path, seed=seed,
                                      no_dynamic_chunk=no_dynamic_chunk)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=1e-6)
    sched = WarmupLR(opt, warmup_steps=WARMUP, min_lr=1e-5)
    curves = []
    best = (None, None, None)                  # (cer, epoch, state_dict)
    for ep in range(epochs):
        losses = []
        for b in batches:
            x = torch.from_numpy(b["inputs"])
            xl = torch.from_numpy(b["input_lens"])
            y = torch.from_numpy(b["labels"])
            yl = torch.from_numpy(b["label_lens"])
            loss_dict = model(x, xl, y, yl)
            loss = loss_dict["loss"]
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
            sched.step()
            losses.append(float(loss.detach()))
            if step_losses is not None:
                step_losses.append(
                    {"loss": float(loss.detach()),
                     "ctc": float(loss_dict["loss_ctc"].detach()),
                     "att": float(loss_dict["loss_att"].detach())})
        curves.append(float(np.mean(losses)))
        log(f"[torch] epoch {ep + 1}/{epochs} loss {curves[-1]:.4f}")
        if eval_fn and eval_every and (ep + 1) % eval_every == 0:
            cer = eval_fn(model)
            model.train()
            log(f"[torch] epoch {ep + 1} eval CER {cer:.4f}")
            if best[0] is None or cer < best[0]:
                best = (cer, ep + 1,
                        copy.deepcopy(model.state_dict()))
    if best[2] is not None:
        model.load_state_dict(best[2])
        log(f"[torch] best epoch {best[1]} (CER {best[0]:.4f}) restored")
    return model, curves


def reference_probs(model, batches):
    import torch
    model.eval()
    outs = []
    with torch.no_grad():
        for b in batches:
            x = torch.from_numpy(b["inputs"])
            xl = torch.from_numpy(b["input_lens"])
            probs = model.get_encoder_out(x, xl)          # softmax probs
            lens = (((xl - 1) // 2 - 1) // 2).clamp(min=1)  # conv2d k3 s2 ×2
            for j in range(b["valid"]):
                outs.append(np.asarray(probs[j, :int(lens[j])]))
    return outs


# ------------------------------------------------------------------ #
# masr_tpu side
# ------------------------------------------------------------------ #


def train_ours(batches, vocab, mean_istd_path, epochs, log, seed=23,
               eval_fn=None, eval_every=0, torch_init=False,
               no_dynamic_chunk=False, same_init_model=None,
               step_losses=None):
    """eval_fn(model, state) → CER every eval_every epochs; the best
    params are restored before returning (mirrors the reference trainer's
    best-checkpoint-by-cer selection, trainer.py:572-590).
    same_init_model: a torch ConformerModel whose CURRENT weights are
    converted into the starting flax params (--same_init / --lockstep —
    overrides torch_init)."""
    import jax
    import jax.numpy as jnp
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.optimizer.schedulers import build_optimizer
    from masr_tpu.training.train_state import TrainState, make_train_step
    with open(mean_istd_path, encoding="utf-8") as f:
        ms = json.load(f)
    enc_conf = dict(ENC_CONF)
    if no_dynamic_chunk:
        enc_conf["use_dynamic_chunk"] = False
    model = build_model(
        "conformer", FEAT, len(vocab), streaming=True,
        encoder_conf=enc_conf, decoder_conf=dict(DEC_CONF),
        model_conf=dict(MODEL_CONF),
        cmvn=GlobalCMVN(np.asarray(ms["mean"]), np.asarray(ms["istd"])))
    rng = jax.random.PRNGKey(seed)
    b0 = batches[0]
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.asarray(b0["inputs"][:2]), jnp.asarray(b0["input_lens"][:2]),
        jnp.asarray(b0["labels"][:2]), jnp.asarray(b0["label_lens"][:2]),
        train=True)
    params = variables["params"]
    if same_init_model is not None:
        params = torch_init_to_flax(same_init_model, model, variables)
    elif torch_init:
        # reference-default init parity: torch kaiming_uniform kernels +
        # uniform biases instead of flax lecun_normal + zeros
        # (models/initializers.py) — the same distributions the
        # reference's own runs start from
        from masr_tpu.models.initializers import torch_default_reinit
        params = torch_default_reinit(params, jax.random.PRNGKey(seed + 7))
    tx, _ = build_optimizer(
        {"optimizer": "Adam", "learning_rate": LR, "weight_decay": 1e-6,
         "scheduler": "WarmupLR",
         "scheduler_conf": {"warmup_steps": WARMUP, "min_lr": 1e-5}},
        grad_clip=CLIP, accum_grad=1)
    state = TrainState.create(model.apply, params, tx,
                              variables.get("batch_stats"))
    train_step = jax.jit(make_train_step(model, tx))
    curves = []
    best = (None, None, None)                  # (cer, epoch, params)
    step_rng = jax.random.PRNGKey(seed * 1000 + 101)
    for ep in range(epochs):
        losses = []
        for b in batches:
            step_rng, r = jax.random.split(step_rng)
            state, metrics = train_step(
                state, {k: jnp.asarray(v) for k, v in b.items()
                        if k != "valid"}, r)
            losses.append(float(metrics["loss"]))
            if step_losses is not None:
                step_losses.append(
                    {"loss": float(metrics["loss"]),
                     "ctc": float(metrics["loss_ctc"]),
                     "att": float(metrics["loss_att"])})
        curves.append(float(np.mean(losses)))
        log(f"[jax]   epoch {ep + 1}/{epochs} loss {curves[-1]:.4f}")
        if eval_fn and eval_every and (ep + 1) % eval_every == 0:
            cer = eval_fn(model, state)
            log(f"[jax]   epoch {ep + 1} eval CER {cer:.4f}")
            if best[0] is None or cer < best[0]:
                best = (cer, ep + 1, jax.tree.map(lambda a: a.copy(),
                                                  state.params))
    if best[2] is not None:
        state = state.replace(params=best[2])
        log(f"[jax]   best epoch {best[1]} (CER {best[0]:.4f}) restored")
    return model, state, curves


def ours_probs(model, state, batches):
    import jax
    import jax.numpy as jnp
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def enc(x, xl):
        return model.apply(variables, x, xl,
                           method=type(model).get_encoder_out)
    outs = []
    for b in batches:
        probs, lens = enc(jnp.asarray(b["inputs"]),
                          jnp.asarray(b["input_lens"]))
        probs, lens = np.asarray(probs), np.asarray(lens)
        for j in range(b["valid"]):
            outs.append(probs[j, :int(lens[j])])
    return outs


# ------------------------------------------------------------------ #


def decode_cer(prob_list, refs, vocab, beam=False):
    """Both frameworks' probs decode through the SAME decoders."""
    from masr_tpu.utils.metrics import cer
    if beam:
        from masr_tpu.decoders.beam_search import BeamSearchDecoder
        dec = BeamSearchDecoder(vocab_list=vocab, beam_size=10,
                                alpha=0.0, beta=0.0)
        hyps = [text for _, text in
                dec.decode_batch_beam_search_offline(prob_list)]
    else:
        from masr_tpu.decoders.greedy import greedy_decoder_batch
        hyps = [text for _, text in
                greedy_decoder_batch(prob_list, vocab)]
    # cer(reference, hypothesis) — the denominator is the REFERENCE
    # length (a latent arg swap here normalized by hypothesis length
    # until r4; both frameworks were measured identically so comparisons
    # held, but absolutes were subtly off and empty early-training
    # hypotheses crashed the eval)
    cers = [cer(r, h) for h, r in zip(hyps, refs)]
    return float(np.mean(cers)), hyps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/h2h")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n_train", type=int, default=320)
    ap.add_argument("--n_test", type=int, default=48)
    ap.add_argument("--skip", choices=["torch", "jax", "none"],
                    default="none", help="skip one side (debug)")
    ap.add_argument("--seeds", default="17",
                    help="comma list; each runs BOTH frameworks")
    ap.add_argument("--hard", action="store_true",
                    help="non-saturating operating point (VERDICT r3 "
                         "item 1): dense char set, longer sentences, "
                         "SNR-controlled noise")
    ap.add_argument("--train_snr", default="-2:6",
                    help="hard mode: per-utt uniform SNR dB range lo:hi")
    ap.add_argument("--test_snr", type=float, default=0.0,
                    help="hard mode: fixed test SNR dB")
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--eval_every", type=int, default=0,
                    help="per-epoch-interval eval + best-checkpoint "
                         "selection (the reference trainer's own "
                         "methodology, trainer.py:572-590); 0 = off "
                         "(report the final epoch)")
    ap.add_argument("--torch_init", action="store_true",
                    help="start the jax side from torch-default init "
                         "distributions (models/initializers.py) — "
                         "matches what reference runs start from")
    ap.add_argument("--dropout0", action="store_true",
                    help="ablation: zero every dropout rate on BOTH "
                         "sides (isolates the one unequalized "
                         "stochastic factor of the r4 head-to-head)")
    ap.add_argument("--no_dynamic_chunk", action="store_true",
                    help="ablation: disable dynamic-chunk mask training "
                         "on BOTH sides (the other unequalized RNG draw)")
    ap.add_argument("--same_init", action="store_true",
                    help="convert the torch model's initial weights to "
                         "flax so both sides start from LITERALLY "
                         "identical numbers (test_convert_parity "
                         "machinery)")
    ap.add_argument("--f32_matmul", action="store_true",
                    help="ablation: force jax_default_matmul_precision="
                         "float32 — on TPU, f32 matmuls otherwise run "
                         "with bf16-rounded inputs (XLA's DEFAULT "
                         "precision), a per-step rounding noise the "
                         "torch-CPU side does not have")
    ap.add_argument("--lockstep", type=int, default=0,
                    help="bisect mode: run N train steps per side from "
                         "the SAME initial weights on identical batches "
                         "and diff the per-step loss/ctc/att curves "
                         "(requires --dropout0 --no_dynamic_chunk; "
                         "writes <out>/lockstep.json)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    logf = open(os.path.join(args.out, "log.txt"), "a")

    def log(msg):
        print(msg, flush=True)
        logf.write(msg + "\n")
        logf.flush()

    t0 = time.time()
    if args.f32_matmul:
        import jax
        jax.config.update("jax_default_matmul_precision", "float32")
        log("f32_matmul: jax matmuls forced to full f32 precision")
    if args.dropout0:
        for conf in (ENC_CONF, DEC_CONF):
            for key in list(conf):
                if key.endswith("dropout_rate"):
                    conf[key] = 0.0
        log("dropout0: every dropout rate zeroed on both sides")
    if args.hard:
        chars, len_lo, len_hi = CHARS_HARD, 6, 13
        tr_snr = tuple(float(v) for v in args.train_snr.split(":"))
        te_snr = args.test_snr
    else:
        chars, len_lo, len_hi = CHARS, 3, 7
        tr_snr = te_snr = None
    train_s, test_s = make_corpus(args.n_train, args.n_test, chars=chars,
                                  len_lo=len_lo, len_hi=len_hi)
    log(f"corpus: {len(train_s)} train / {len(test_s)} test sentences, "
        f"{len(chars)} chars, hard={args.hard} "
        f"(train_snr={tr_snr}, test_snr={te_snr})")
    tr_feats = featurize(train_s, 0, speakers=args.speakers, snr_db=tr_snr)
    te_feats = featurize(test_s, 7, speakers=args.speakers, snr_db=te_snr)
    vocab, c2i = build_vocab(train_s)
    mean_istd = write_mean_istd(tr_feats,
                                os.path.join(args.out, "mean_istd.json"))
    tr_batches = make_batches(tr_feats, train_s, c2i)
    te_batches = make_batches(te_feats, test_s, c2i)
    te_order = np.argsort([f.shape[0] for f in te_feats])
    te_refs = [test_s[i] for i in te_order]
    log(f"features ready in {time.time() - t0:.1f}s; "
        f"maxT={max(f.shape[0] for f in tr_feats)}")

    seeds = [int(s) for s in args.seeds.split(",")]

    if args.lockstep:
        # ---- bisect mode: identical weights, identical batches, no
        # stochastic factors → per-step loss curves must overlay to
        # numerics; the first divergent step localizes any behavioral
        # difference between the frameworks (VERDICT r4 item 2). ----
        assert args.dropout0 and args.no_dynamic_chunk, \
            "--lockstep needs --dropout0 --no_dynamic_chunk (both sides " \
            "deterministic)"
        import copy
        import math
        seed = seeds[0]
        n_epochs = max(1, math.ceil(args.lockstep / len(tr_batches)))
        t_model = build_reference_model(vocab, mean_istd, seed=seed,
                                        no_dynamic_chunk=True)
        t_init = copy.deepcopy(t_model)
        j_steps = []
        train_ours(tr_batches, vocab, mean_istd, n_epochs, log, seed=seed,
                   no_dynamic_chunk=True, same_init_model=t_init,
                   step_losses=j_steps)
        t_steps = []
        train_reference(tr_batches, vocab, mean_istd, n_epochs, log,
                        seed=seed, model=t_model, step_losses=t_steps)
        n = min(args.lockstep, len(t_steps), len(j_steps))
        rows = []
        first_div = None
        for i in range(n):
            row = {"step": i + 1}
            for key in ("loss", "ctc", "att"):
                tv, jv = t_steps[i][key], j_steps[i][key]
                row[f"torch_{key}"] = tv
                row[f"jax_{key}"] = jv
                row[f"rel_{key}"] = abs(tv - jv) / max(abs(tv), 1e-6)
            rows.append(row)
            if first_div is None and row["rel_loss"] > 5e-3:
                first_div = i + 1
        out = {"steps": rows, "first_div_step_rel5e-3": first_div,
               "max_rel_loss": max(r["rel_loss"] for r in rows),
               "final_rel_loss": rows[-1]["rel_loss"],
               "config_note": "same converted init, identical batches, "
                              "dropout0, no dynamic chunk"}
        with open(os.path.join(args.out, "lockstep.json"), "w") as f:
            json.dump(out, f, indent=2)
        for r in rows[:8] + rows[8::max(1, n // 12)]:
            log(f"step {r['step']:3d}: loss torch {r['torch_loss']:.5f} "
                f"jax {r['jax_loss']:.5f} rel {r['rel_loss']:.2e} "
                f"(ctc {r['rel_ctc']:.1e} att {r['rel_att']:.1e})")
        log(f"lockstep: max rel |Δloss| {out['max_rel_loss']:.2e} over "
            f"{n} steps; first step beyond 5e-3: {first_div}")
        return

    report = {"config": {"enc": ENC_CONF, "dec": DEC_CONF,
                         "model": MODEL_CONF, "lr": LR, "warmup": WARMUP,
                         "epochs": args.epochs, "seeds": seeds,
                         "hard": args.hard, "train_snr": list(tr_snr or []),
                         "test_snr": te_snr, "speakers": args.speakers,
                         "n_chars": len(chars),
                         "sent_len": [len_lo, len_hi - 1],
                         "eval_every": args.eval_every,
                         "torch_init": args.torch_init,
                         "dropout0": args.dropout0,
                         "no_dynamic_chunk": args.no_dynamic_chunk,
                         "same_init": args.same_init,
                         "f32_matmul": args.f32_matmul,
                         "n_train": args.n_train, "n_test": args.n_test},
              "masr_tpu": {"runs": []}, "reference": {"runs": []}}
    curves = {}

    def finish(side, probs, seed, curve):
        g_cer, _ = decode_cer(probs, te_refs, vocab, beam=False)
        b_cer, _ = decode_cer(probs, te_refs, vocab, beam=True)
        report[side]["runs"].append(
            {"seed": seed, "greedy_cer": g_cer, "beam_cer": b_cer,
             "final_loss": curve[-1]})
        log(f"[{side}] seed={seed} test CER "
            f"greedy={g_cer:.4f} beam={b_cer:.4f}")

    def eval_jax(model, state):
        probs = ours_probs(model, state, te_batches)
        cer, _ = decode_cer(probs, te_refs, vocab, beam=False)
        return cer

    def eval_torch(model):
        probs = reference_probs(model, te_batches)
        cer, _ = decode_cer(probs, te_refs, vocab, beam=False)
        return cer

    ee = args.eval_every
    for seed in seeds:
        same_init = None
        t_model = None
        if args.same_init:
            import copy
            t_model = build_reference_model(
                vocab, mean_istd, seed=seed,
                no_dynamic_chunk=args.no_dynamic_chunk)
            same_init = copy.deepcopy(t_model)
        if args.skip != "jax":
            jm, jstate, jcurve = train_ours(
                tr_batches, vocab, mean_istd, args.epochs, log, seed=seed,
                eval_fn=eval_jax if ee else None, eval_every=ee,
                torch_init=args.torch_init,
                no_dynamic_chunk=args.no_dynamic_chunk,
                same_init_model=same_init)
            curves[f"jax_s{seed}"] = jcurve
            finish("masr_tpu", ours_probs(jm, jstate, te_batches),
                   seed, jcurve)
        if args.skip != "torch":
            tm, tcurve = train_reference(
                tr_batches, vocab, mean_istd, args.epochs, log, seed=seed,
                eval_fn=eval_torch if ee else None, eval_every=ee,
                no_dynamic_chunk=args.no_dynamic_chunk, model=t_model)
            curves[f"torch_s{seed}"] = tcurve
            finish("reference", reference_probs(tm, te_batches),
                   seed, tcurve)

    for side in ("masr_tpu", "reference"):
        runs = report[side]["runs"]
        if not runs:
            continue
        for kind in ("greedy_cer", "beam_cer"):
            vals = np.array([r[kind] for r in runs])
            report[side][kind + "_mean"] = float(vals.mean())
            report[side][kind + "_std"] = float(vals.std(ddof=1)
                                                if len(vals) > 1 else 0.0)
            report[side][kind + "_range"] = [float(vals.min()),
                                             float(vals.max())]
    report["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(args.out, "loss_curves.jsonl"), "w") as f:
        for fw, cu in curves.items():
            for ep, lo in enumerate(cu):
                f.write(json.dumps({"framework": fw, "epoch": ep + 1,
                                    "loss": lo}) + "\n")
    log(f"report written to {args.out}/report.json "
        f"({report['wall_s']}s total)")


if __name__ == "__main__":
    main()
