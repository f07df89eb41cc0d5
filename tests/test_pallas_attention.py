"""Pallas fused rel-pos flash attention: numerics vs the XLA reference
(interpret mode on CPU) and model-level flash-flag equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masr_tpu.ops.pallas.attention import (rel_pos_attention_reference,
                                           rel_pos_flash_attention)


def _inputs(B=2, H=2, T=128, d=64, seed=0):
    rs = np.random.RandomState(seed)
    q, k, v = [jnp.asarray(rs.standard_normal((B, H, T, d)), jnp.float32)
               for _ in range(3)]
    p = jnp.asarray(rs.standard_normal((H, T, d)), jnp.float32)
    bu, bv = [jnp.asarray(rs.standard_normal((H, d)) * 0.1, jnp.float32)
              for _ in range(2)]
    return q, k, v, p, bu, bv


def test_flash_matches_reference_full_mask():
    q, k, v, p, bu, bv = _inputs()
    mask = jnp.ones((2, 128, 128), bool)
    ref = rel_pos_attention_reference(q, k, v, p, bu, bv, mask)
    out = rel_pos_flash_attention(q, k, v, p, bu, bv, mask, block_q=64,
                                  block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_flash_matches_reference_chunk_mask_with_padding():
    q, k, v, p, bu, bv = _inputs(seed=1)
    B, T = 2, 128
    lens = [128, 70]
    mask = np.zeros((B, T, T), bool)
    for b in range(B):
        for c in range(0, T, 32):  # block-causal chunks of 32
            mask[b, c:c + 32, : min(c + 32, lens[b])] = True
        mask[b, lens[b]:, :] = False
    mask = jnp.asarray(mask)
    ref = rel_pos_attention_reference(q, k, v, p, bu, bv, mask)
    out = rel_pos_flash_attention(q, k, v, p, bu, bv, mask, block_q=64,
                                  block_k=64, interpret=True)
    # padded (fully-masked) query rows are don't-care; compare valid rows
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, :, : lens[b]],
                                   np.asarray(ref)[b, :, : lens[b]],
                                   atol=2e-5, rtol=2e-5)


def test_flash_non_divisible_lengths():
    q, k, v, p, bu, bv = _inputs(T=96, seed=2)  # 96 not divisible by 64
    mask = jnp.ones((2, 96, 96), bool)
    ref = rel_pos_attention_reference(q, k, v, p, bu, bv, mask)
    out = rel_pos_flash_attention(q, k, v, p, bu, bv, mask, block_q=64,
                                  block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_model_flash_flag_matches_default():
    """ConformerEncoder with use_flash_attention=True must produce the same
    full-context output as the default path (eval mode, no dropout)."""
    from masr_tpu.models.conformer import ConformerEncoder
    from masr_tpu.models.cmvn import GlobalCMVN
    import masr_tpu.ops.pallas.attention as pa
    import functools
    # route the kernel through interpret mode on CPU
    orig = pa.rel_pos_flash_attention
    pa.rel_pos_flash_attention = functools.partial(orig.__wrapped__,
                                                   interpret=True) \
        if hasattr(orig, "__wrapped__") else functools.partial(orig,
                                                               interpret=True)
    try:
        rs = np.random.RandomState(3)
        kw = dict(input_size=80, output_size=32, attention_heads=2,
                  linear_units=32, num_blocks=1, cnn_module_kernel=7,
                  dropout_rate=0.0, attention_dropout_rate=0.0,
                  positional_dropout_rate=0.0,
                  cmvn=GlobalCMVN(np.zeros(80), np.ones(80)))
        enc0 = ConformerEncoder(**kw)
        enc1 = ConformerEncoder(use_flash_attention=True, **kw)
        speech = jnp.asarray(rs.standard_normal((2, 131, 80)), jnp.float32)
        lens = jnp.asarray([131, 100])
        rng = jax.random.PRNGKey(0)
        v0 = enc0.init({"params": rng}, speech, lens)
        out0, m0 = enc0.apply(v0, speech, lens, decoding_chunk_size=-1)
        out1, m1 = enc1.apply(v0, speech, lens, decoding_chunk_size=-1)
        valid = np.asarray(m0[:, 0, :])
        d = np.abs(np.asarray(out0) - np.asarray(out1))[valid]
        assert d.max() < 5e-4
    finally:
        pa.rel_pos_flash_attention = orig


def test_auto_routing_picks_flash_by_length(monkeypatch):
    """use_flash_attention='auto' (the default): short utterances stay on
    the XLA path, T past the measured crossover routes through the flash
    kernel — no manual flag (VERDICT r2 item 7)."""
    from masr_tpu.models.conformer import ConformerEncoder
    from masr_tpu.models.cmvn import GlobalCMVN
    import masr_tpu.ops.pallas.attention as pa
    calls = {"n": 0}
    orig = pa.rel_pos_flash_attention

    def counting(*a, **k):
        calls["n"] += 1
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa, "rel_pos_flash_attention", counting)
    monkeypatch.setattr(pa, "FORCE_ON_CPU", True)
    monkeypatch.setattr(pa, "FLASH_CROSSOVER_T", 64)
    kw = dict(input_size=80, output_size=32, attention_heads=2,
              linear_units=32, num_blocks=1, cnn_module_kernel=7,
              dropout_rate=0.0, attention_dropout_rate=0.0,
              positional_dropout_rate=0.0,
              cmvn=GlobalCMVN(np.zeros(80), np.ones(80)))
    enc = ConformerEncoder(**kw)     # default routing = "auto"
    assert enc.use_flash_attention == "auto"
    rs = np.random.RandomState(5)
    rng = jax.random.PRNGKey(0)
    short = jnp.asarray(rs.standard_normal((1, 131, 80)), jnp.float32)
    v = enc.init({"params": rng}, short, jnp.asarray([131]))
    enc.apply(v, short, jnp.asarray([131]), decoding_chunk_size=-1)
    assert calls["n"] == 0           # T2≈32 < crossover → XLA
    long = jnp.asarray(rs.standard_normal((1, 540, 80)), jnp.float32)
    enc.apply(v, long, jnp.asarray([540]), decoding_chunk_size=-1)
    assert calls["n"] == 1           # T2≈134 ≥ crossover → flash
    # explicit False still disables
    calls["n"] = 0
    enc_off = ConformerEncoder(use_flash_attention=False, **kw)
    enc_off.apply(v, long, jnp.asarray([540]), decoding_chunk_size=-1)
    assert calls["n"] == 0
