"""On-device SpecAugment (batched, rng-driven) and the fused
fbank→SpecAugment input transform (BASELINE north star: feature frontend +
augmentation as one jitted device program feeding HBM directly).

The host pipeline (data/augmentation) covers the reference semantics; this
module is the TPU path: masks are built from iota comparisons against
random scalars, so one compiled program serves every draw, every batch.
"""
import functools

import jax
import jax.numpy as jnp

from masr_tpu.ops.fbank import fbank_jax


def _mask_axis(rng, shape, axis_len, max_width, n_masks, axis, length=None):
    """Random zero-masks along `axis` of a (B, T, F) tensor → bool keep-mask."""
    B = shape[0]
    rngs = jax.random.split(rng, 2)
    widths = jax.random.randint(rngs[0], (B, n_masks), 0, max_width + 1)
    limit = axis_len if length is None else length[:, None]
    starts = (jax.random.uniform(rngs[1], (B, n_masks))
              * jnp.maximum(limit - widths, 1)).astype(jnp.int32)
    pos = jnp.arange(axis_len)[None, None, :]          # (1, 1, L)
    hit = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    keep = ~jnp.any(hit, axis=1)                        # (B, L)
    if axis == 1:
        return keep[:, :, None]
    return keep[:, None, :]


@functools.partial(jax.jit, static_argnames=("n_freq_masks", "n_time_masks",
                                             "max_f", "max_t", "replace_with_zero"))
def specaug_jax(feats, lens, rng, *, n_freq_masks=2, n_time_masks=2,
                max_f=10, max_t=50, replace_with_zero=False):
    """Batched SpecAugment on device (parity semantics:
    augmentor/spec_augment.py — freq + time masks, zero-or-mean fill;
    the PIL time-warp is host-only and intentionally omitted here).

    feats: (B, T, F); lens: (B,) valid frames; → masked (B, T, F)."""
    B, T, F = feats.shape
    r1, r2 = jax.random.split(rng)
    keep_f = _mask_axis(r1, feats.shape, F, max_f, n_freq_masks, axis=2)
    keep_t = _mask_axis(r2, feats.shape, T, max_t, n_time_masks, axis=1,
                        length=lens)
    keep = keep_f & keep_t
    if replace_with_zero:
        fill = jnp.zeros((B, 1, 1), feats.dtype)
    else:
        valid = (jnp.arange(T)[None, :] < lens[:, None])[..., None]
        fill = (jnp.sum(jnp.where(valid, feats, 0.0), axis=(1, 2))
                / jnp.maximum(lens * F, 1))[:, None, None]
    return jnp.where(keep, feats, fill.astype(feats.dtype))


@functools.partial(jax.jit, static_argnames=("max_t", "num_t_sub"))
def specsub_jax(feats, lens, rng, *, max_t=20, num_t_sub=3):
    """Batched SpecSub on device (parity semantics: the host
    SpecSubAugmentor / reference spec_sub.py:6-40): num_t_sub times,
    overwrite a random ≤max_t-frame span with the span `pos` frames
    earlier FROM THE ORIGINAL input; later substitutions override
    earlier ones. Vectorized as a per-frame source-index map + one
    gather.

    feats: (B, T, F); lens: (B,) valid frames; → substituted (B, T, F).
    """
    B, T, F = feats.shape
    idx = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    src = idx
    for _ in range(num_t_sub):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        # Reference draws (spec_sub.py:36-39): start ∈ [0, max_frames-1],
        # length ∈ [1, max_t], end clamped to max_frames, pos ∈ [0, start].
        # Per-utterance max_frames is lens[b] here (frames past lens are pad).
        t = jax.random.randint(r1, (B,), 1, max(max_t, 1) + 1)
        start = jax.random.randint(r2, (B,), 0, jnp.maximum(lens, 1))
        pos = jax.random.randint(r3, (B,), 0, start + 1)
        in_span = ((idx >= start[:, None]) & (idx < (start + t)[:, None])
                   & (idx < lens[:, None]))
        src = jnp.where(in_span, idx - pos[:, None], src)
    return jnp.take_along_axis(feats, src[:, :, None], axis=1)


def fbank_specaug(waveform, lengths, rng, *, num_mel_bins=80, dither=1.0,
                  sample_rate=16000, **specaug_kwargs):
    """Fused device input transform: int16-scale waveforms → fbank →
    SpecAugment, one jitted program (north-star input pipeline)."""
    r1, r2 = jax.random.split(rng)
    feats, feat_lens = fbank_jax(waveform, lengths, r1,
                                 num_mel_bins=num_mel_bins, dither=dither,
                                 sample_rate=sample_rate)
    return specaug_jax(feats, feat_lens, r2, **specaug_kwargs), feat_lens


def make_device_frontend(preprocess_conf, specaug_conf=None,
                         specsub_conf=None):
    """→ frontend(waveforms, sample_lens, rng, train) → (feats, lens), the
    callable make_train_step/make_eval_step fuse into the compiled step
    (dataset_conf.on_device_frontend). Train applies Kaldi dither +
    SpecAugment + SpecSub; eval is deterministic. The conf dicts mirror
    the host augmentors (augmentation.json specaug/specsub params)."""
    pre = dict(preprocess_conf or {})
    method = pre.get("feature_method", "fbank")
    if method != "fbank":
        raise ValueError(
            f"on-device frontend supports fbank (got {method})")
    n_mels = int(pre.get("n_mels", 80))
    sr = int(pre.get("sample_rate", 16000))
    sa = dict(specaug_conf or {})
    kwargs = dict(
        n_freq_masks=int(sa.get("n_freq_masks", 2)),
        n_time_masks=int(sa.get("n_time_masks", 2)),
        max_f=int(sa.get("F", sa.get("max_f", 10))),
        max_t=int(sa.get("T", sa.get("max_t", 50))))
    ss = dict(specsub_conf) if specsub_conf else None

    def frontend(waveforms, sample_lens, rng, train):
        if train:
            rng, r_sub = jax.random.split(rng)
            feats, lens = fbank_specaug(waveforms, sample_lens, rng,
                                        num_mel_bins=n_mels, dither=1.0,
                                        sample_rate=sr, **kwargs)
            if ss is not None:
                feats = specsub_jax(feats, lens, r_sub,
                                    max_t=int(ss.get("max_t", 20)),
                                    num_t_sub=int(ss.get("num_t_sub", 3)))
            return feats, lens
        return fbank_jax(waveforms, sample_lens, None,
                         num_mel_bins=n_mels, dither=0.0, sample_rate=sr)

    return frontend
