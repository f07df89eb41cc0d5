"""Multi-chunk ticks (ops/pallas/chunk_layer.py n_sub > 1): one kernel
call over k buffered sub-chunks with a block-causal sub-chunk mask must
be bit-equivalent to k sequential chunk steps (bf16 / positions-table
routes), and the batch engine's tick_chunks knob must keep transcripts
equal end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.models.embedding import sinusoid_position_encoding
from masr_tpu.ops.pallas.chunk_layer import (
    clamp_pos_starts, fused_chunk_layer, make_chunk_pos_table)

B, c, D, F, H, C, KS = 3, 16, 64, 96, 2, 64, 7
d_k = D // H
K_SUB = 2
CTOT = K_SUB * c


def _params(rs):
    f32 = jnp.float32
    return {
        "lnw": jnp.asarray(rs.standard_normal((6, 2, D)) * 0.1
                           + (np.arange(2)[None, :, None] == 0), f32),
        "ffw1": jnp.asarray(rs.standard_normal((2, D, F)) * 0.1, f32),
        "ffb1": jnp.asarray(rs.standard_normal((2, F)) * 0.05, f32),
        "ffw2": jnp.asarray(rs.standard_normal((2, F, D)) * 0.1, f32),
        "vecb": jnp.asarray(rs.standard_normal((8, D)) * 0.05, f32),
        "attw": jnp.asarray(rs.standard_normal((4, D, D)) * 0.1, f32),
        "posb": jnp.asarray(rs.standard_normal((2, D)) * 0.05, f32),
        "pw1w": jnp.asarray(rs.standard_normal((D, 2 * D)) * 0.1, f32),
        "pw1b": jnp.asarray(rs.standard_normal((1, 2 * D)) * 0.05, f32),
        "pw2w": jnp.asarray(rs.standard_normal((D, D)) * 0.1, f32),
        "dww": jnp.asarray(rs.standard_normal((KS, D)) * 0.1, f32),
    }


def _inputs(rs):
    x = jnp.asarray(rs.standard_normal((B, CTOT, D)) * 0.3, jnp.float32)
    cache = jnp.asarray(rs.standard_normal((B, H, C, 2 * d_k)) * 0.5,
                        jnp.float32)
    cc = jnp.asarray(rs.standard_normal((B, KS - 1, D)) * 0.2, jnp.float32)
    clens = jnp.asarray([0, 16, C][:B], jnp.int32)
    offsets = jnp.asarray([0, 16, 200][:B], jnp.int32)
    return x, cache, cc, clens, offsets


def _posw(offsets, L):
    pos = jnp.maximum((offsets - C)[:, None] + jnp.arange(L)[None, :], 0)
    return sinusoid_position_encoding(pos.reshape(-1), D,
                                      jnp.float32).reshape(B, L, D)


def test_multi_chunk_matches_sequential_bf16():
    rs = np.random.RandomState(0)
    p = _params(rs)
    x, cache, cc, clens, offsets = _inputs(rs)
    Ls = C + c
    ac, ccc, cl, off = cache, cc, clens, offsets
    y_seq = []
    for i in range(K_SUB):
        y, ac, ccc = fused_chunk_layer(
            x[:, i * c:(i + 1) * c], _posw(off, Ls), ac, ccc, cl, p,
            n_head=H, ksize=KS, interpret=True)
        y_seq.append(y)
        cl = jnp.minimum(cl + c, C)
        off = off + c
    y_seq = jnp.concatenate(y_seq, axis=1)

    y_m, ac_m, cc_m = fused_chunk_layer(
        x, _posw(offsets, C + CTOT), cache, cc, clens, p,
        n_head=H, ksize=KS, interpret=True, n_sub=K_SUB)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_seq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ac_m), np.asarray(ac),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cc_m), np.asarray(ccc),
                               rtol=2e-5, atol=2e-5)


def test_multi_chunk_matches_sequential_table_route():
    rs = np.random.RandomState(1)
    p = _params(rs)
    x, cache, cc, clens, offsets = _inputs(rs)
    wpos = jnp.asarray(rs.standard_normal((D, D)) * 0.1, jnp.float32)
    tab = make_chunk_pos_table(wpos, C, 1024, jnp.float32)
    Ls = C + c
    ac, ccc, cl, off = cache, cc, clens, offsets
    y_seq = []
    for i in range(K_SUB):
        y, ac, ccc = fused_chunk_layer(
            x[:, i * c:(i + 1) * c], None, ac, ccc, cl, p, None, tab,
            clamp_pos_starts(off, 1024, Ls), n_head=H, ksize=KS,
            interpret=True)
        y_seq.append(y)
        cl = jnp.minimum(cl + c, C)
        off = off + c
    y_seq = jnp.concatenate(y_seq, axis=1)

    y_m, ac_m, _ = fused_chunk_layer(
        x, None, cache, cc, clens, p, None, tab,
        clamp_pos_starts(offsets, 1024, C + CTOT), n_head=H, ksize=KS,
        interpret=True, n_sub=K_SUB)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_seq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ac_m), np.asarray(ac),
                               rtol=2e-5, atol=2e-5)


def test_encoder_multi_tick_matches_sequential():
    """forward_chunk_batched with (N, k, T_in, feat) windows must equal k
    sequential batched calls, through the embed + mask + positions path."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model

    FEAT = 80
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=32, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, 7, streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)

    N, k, W = 2, 2, 67
    rs = np.random.RandomState(5)
    wins = jnp.asarray(rs.standard_normal((N, k, W, FEAT)) * 0.5,
                       jnp.float32)
    cache_size = 64
    state = model.apply(variables, method=lambda m: m.encoder.init_cache(
        batch=N, cache_size=cache_size))
    # stacked-state layout of the batch engine: leaf batch dim leads
    state = {
        "att_cache": state["att_cache"].transpose(1, 0, 2, 3, 4)[:, :, None],
        "cnn_cache": state["cnn_cache"].transpose(1, 0, 2, 3)[:, :, None],
        "offset": jnp.zeros((N,), jnp.int32),
        "cache_len": jnp.zeros((N,), jnp.int32),
    }
    cl.FORCE_ON_CPU = True
    try:
        packed = model.apply(variables, cache_size,
                             method=type(model).pack_chunk_params)
        st = state
        probs_seq = []
        for i in range(k):
            pr, st = model.apply(
                variables, wins[:, i], st, packed,
                method=type(model).get_encoder_out_chunk_batched)
            probs_seq.append(pr)
        probs_seq = jnp.concatenate(probs_seq, axis=1)

        probs_m, st_m = model.apply(
            variables, wins, state, packed,
            method=type(model).get_encoder_out_chunk_batched)
    finally:
        cl.FORCE_ON_CPU = False
    np.testing.assert_allclose(np.asarray(probs_m), np.asarray(probs_seq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_m["att_cache"]),
                               np.asarray(st["att_cache"]),
                               rtol=2e-5, atol=2e-5)
    assert int(st_m["offset"][0]) == int(st["offset"][0])
    assert int(st_m["cache_len"][0]) == int(st["cache_len"][0])


def test_engine_tick_chunks_matches_single(tmp_path):
    """BatchStreamSession(tick_chunks=2) transcripts == tick_chunks=1 on
    multi-chunk streams, through feed AND feed_many."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "天", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=32, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(tmp_path), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(tmp_path), decoder="ctc_greedy",
                              warmup=False)
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=4)

    def wave(seed, seconds=3.0):
        rs = np.random.RandomState(seed)
        n = int(16000 * seconds)
        t = np.arange(n) / 16000
        return (0.3 * np.sin(2 * np.pi * (200 + 100 * seed) * t)
                + 0.02 * rs.standard_normal(n)).astype(np.float32)

    waves = [wave(s + 70) for s in range(2)]
    cl.FORCE_ON_CPU = True
    try:
        base = BatchStreamSession(predictor.predictor,
                                  predictor._text_featurizer.vocab_list,
                                  **kw)
        multi = BatchStreamSession(predictor.predictor,
                                   predictor._text_featurizer.vocab_list,
                                   tick_chunks=2, **kw)
        assert base.tick_k == 1 and multi.tick_k == 2
        assert multi._use_fused_chunk

        texts = {}
        for name, sess in (("base", base), ("multi", multi)):
            # feed: big pieces so several windows buffer up per call
            slot = sess.open()
            res = None
            step = 16000
            for i in range(len(waves[0]) // step + 1):
                piece = waves[0][i * step:(i + 1) * step]
                if len(piece) == 0:
                    continue
                out = sess.feed(slot, piece,
                                is_end=(i + 1) * step >= len(waves[0]))
                if out is not None:
                    res = out["text"]
            sess.close(slot)
            # feed_many: two concurrent streams
            slots = [sess.open() for _ in range(2)]
            res2 = [None, None]
            for i in range(len(waves[0]) // step + 1):
                items = []
                for sidx, slot_i in enumerate(slots):
                    piece = waves[sidx][i * step:(i + 1) * step]
                    if len(piece):
                        items.append((slot_i, piece,
                                      (i + 1) * step >= len(waves[sidx])))
                if not items:
                    continue
                outs = sess.feed_many(items)
                for sidx, slot_i in enumerate(slots):
                    if outs.get(slot_i) is not None:
                        res2[sidx] = outs[slot_i]["text"]
            for slot_i in slots:
                sess.close(slot_i)
            texts[name] = (res, tuple(res2))
    finally:
        cl.FORCE_ON_CPU = False
    assert texts["multi"] == texts["base"], texts


def test_device_beam_decode_fn_chunk_size_invariant():
    """decode_fn over one 2·CH-frame call == two CH-frame calls (the
    multi-chunk tick feeds the fused beam head k·CH frames at once)."""
    from masr_tpu.decoders.device_beam import make_stream_decode_fn

    V, CH, N = 12, 8, 3
    init_fn, decode_fn = make_stream_decode_fn(beam_size=4, cutoff_top_n=6)
    rs = np.random.RandomState(0)
    logits = rs.standard_normal((N, 2 * CH, V)).astype(np.float32)
    logits[..., 0] += 1.0          # favor blanks a bit
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = jnp.asarray(e / e.sum(-1, keepdims=True))
    fv = np.ones((N, 2 * CH), bool)
    fv[1, CH + 3:] = False          # one slot with a partial second chunk
    fv = jnp.asarray(fv)

    st = init_fn(N)
    st_a, best_a = decode_fn(st, probs, fv)

    st = init_fn(N)
    st, _ = decode_fn(st, probs[:, :CH], fv[:, :CH])
    st_b, best_b = decode_fn(st, probs[:, CH:], fv[:, CH:])

    for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(best_a, best_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_engine_tick_chunks_beam_decoder(tmp_path):
    """tick_chunks=2 with the on-device beam decoder: transcripts equal
    the single-tick beam engine."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "天", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=32, num_blocks=1,
               r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(tmp_path), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(tmp_path), decoder="ctc_greedy",
                              warmup=False)
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=2, decoder="ctc_beam_search_device",
              decoder_conf=dict(beam_size=4, cutoff_top_n=6))

    def wave(seed, seconds=2.5):
        rs = np.random.RandomState(seed)
        n = int(16000 * seconds)
        t = np.arange(n) / 16000
        return (0.3 * np.sin(2 * np.pi * (200 + 100 * seed) * t)
                + 0.02 * rs.standard_normal(n)).astype(np.float32)

    w = wave(91)
    cl.FORCE_ON_CPU = True
    try:
        texts = {}
        for name, tick in (("base", 1), ("multi", 2)):
            sess = BatchStreamSession(
                predictor.predictor, predictor._text_featurizer.vocab_list,
                tick_chunks=tick, **kw)
            assert sess.tick_k == tick
            slot = sess.open()
            res = None
            step = 16000
            for i in range(len(w) // step + 1):
                piece = w[i * step:(i + 1) * step]
                if len(piece) == 0:
                    continue
                out = sess.feed(slot, piece,
                                is_end=(i + 1) * step >= len(w))
                if out is not None:
                    res = out["text"]
            sess.close(slot)
            texts[name] = res
    finally:
        cl.FORCE_ON_CPU = False
    assert texts["multi"] == texts["base"], texts
