"""Fused batched streaming chunk path for Squeezeformer
(ops/pallas/chunk_layer_sq.py + SqueezeformerEncoder.forward_chunk_batched):
must reproduce the vmapped forward_chunk exactly — per-slot offsets,
reduce/recover plumbing, half-rate stride-sliced caches, folded BatchNorm
— and keep engine transcripts equal end to end, including multi-chunk
ticks."""
import numpy as np
import jax
import jax.numpy as jnp

from masr_tpu.models.cmvn import GlobalCMVN
from masr_tpu.models.registry import build_model

FEAT = 80
ENC = dict(encoder_dim=32, output_size=32, attention_heads=2,
           num_blocks=4, reduce_idx=1, recover_idx=3,
           feed_forward_expansion_factor=2, cnn_module_kernel=7)
DEC = dict(attention_heads=2, linear_units=32, num_blocks=1,
           r_num_blocks=0)


def _make_model():
    model = build_model("squeezeformer", FEAT, 7, streaming=True,
                        encoder_conf=ENC, decoder_conf=DEC,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    return model, variables


def test_sq_fused_chunk_matches_vmapped():
    import masr_tpu.ops.pallas.conformer_layer as cl

    model, variables = _make_model()
    N, W, C = 3, 67, 32
    rs = np.random.RandomState(7)
    xs = jnp.asarray(rs.standard_normal((N, W, FEAT)) * 0.5, jnp.float32)
    offsets = jnp.asarray([0, 16, 48], jnp.int32)
    cache_lens = jnp.minimum(offsets, C)
    Lyr, h, d_k = ENC["num_blocks"], 2, 16
    att = jnp.asarray(rs.standard_normal((Lyr, N, h, C, 2 * d_k)) * 0.3,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((Lyr, N, 6, 32)) * 0.2,
                      jnp.float32)

    def run_seq(mod):
        ys, na, nc = [], [], []
        for s in range(N):
            y, a, c = mod.encoder.forward_chunk(
                xs[s:s + 1], offsets[s], att[:, s:s + 1],
                cnn[:, s:s + 1], cache_lens[s])
            ys.append(y)
            na.append(a)
            nc.append(c)
        return (jnp.concatenate(ys, 0), jnp.concatenate(na, 1),
                jnp.concatenate(nc, 1))

    y_ref, a_ref, c_ref = model.apply(variables, method=run_seq)

    cl.FORCE_ON_CPU = True
    try:
        assert model.apply(variables, 16, C, N,
                           method=type(model).chunk_fused_ok)
        packed = model.apply(variables, C,
                             method=type(model).pack_chunk_params)

        def run_fused(mod):
            return mod.encoder.forward_chunk_batched(
                xs, offsets, att, cnn, cache_lens, packed=packed)

        y_f, a_f, c_f = model.apply(variables, method=run_fused)
    finally:
        cl.FORCE_ON_CPU = False

    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_ref),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                               rtol=3e-5, atol=3e-5)


def test_sq_fused_multi_tick_matches_sequential():
    """(N, 2, T_in, F) multi-chunk tick == two sequential fused calls."""
    import masr_tpu.ops.pallas.conformer_layer as cl

    model, variables = _make_model()
    N, W, C, k = 2, 67, 64, 2
    rs = np.random.RandomState(9)
    wins = jnp.asarray(rs.standard_normal((N, k, W, FEAT)) * 0.5,
                       jnp.float32)
    offsets = jnp.asarray([0, 32], jnp.int32)
    cache_lens = jnp.minimum(offsets, C)
    Lyr, h, d_k = ENC["num_blocks"], 2, 16
    att = jnp.asarray(rs.standard_normal((Lyr, N, h, C, 2 * d_k)) * 0.3,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((Lyr, N, 6, 32)) * 0.2,
                      jnp.float32)
    cl.FORCE_ON_CPU = True
    try:
        packed = model.apply(variables, C,
                             method=type(model).pack_chunk_params)

        def run(mod):
            y1, a1, c1 = mod.encoder.forward_chunk_batched(
                wins[:, 0], offsets, att, cnn, cache_lens, packed=packed)
            ch = y1.shape[1]
            y2, a2, c2 = mod.encoder.forward_chunk_batched(
                wins[:, 1], offsets + ch, a1, c1,
                jnp.minimum(cache_lens + ch, C), packed=packed)
            y_m, a_m, c_m = mod.encoder.forward_chunk_batched(
                wins, offsets, att, cnn, cache_lens, packed=packed)
            return jnp.concatenate([y1, y2], 1), a2, c2, y_m, a_m, c_m

        y_seq, a_seq, c_seq, y_m, a_m, c_m = model.apply(variables,
                                                         method=run)
    finally:
        cl.FORCE_ON_CPU = False
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_seq),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_seq),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(c_m), np.asarray(c_seq),
                               rtol=3e-5, atol=3e-5)


def test_sq_engine_fused_matches_vmapped_transcripts(tmp_path):
    """BatchStreamSession on a squeezeformer bundle: the fused route
    (FORCE_ON_CPU) must produce the same transcripts as the vmapped
    engine, incl. tick_chunks=2."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor

    vocab = ["<blank>", "<unk>", "你", "好", "天", "<space>", "<eos>"]
    model = build_model("squeezeformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=ENC, decoder_conf=DEC,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    save_inference_bundle(str(tmp_path), "squeezeformer", True, FEAT,
                          vocab, np.zeros(FEAT), np.ones(FEAT), ENC, DEC,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(tmp_path), decoder="ctc_greedy",
                              warmup=False)
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=2)

    def wave(seed, seconds=2.5):
        rs = np.random.RandomState(seed)
        n = int(16000 * seconds)
        t = np.arange(n) / 16000
        return (0.3 * np.sin(2 * np.pi * (200 + 100 * seed) * t)
                + 0.02 * rs.standard_normal(n)).astype(np.float32)

    w = wave(55)
    texts = {}
    for name, force, tick in (("vmapped", False, 1), ("fused", True, 1),
                              ("fused_k2", True, 2)):
        cl.FORCE_ON_CPU = force
        try:
            sess = BatchStreamSession(
                predictor.predictor, predictor._text_featurizer.vocab_list,
                tick_chunks=tick, **kw)
            if force:
                assert sess._use_fused_chunk and sess.tick_k == tick
            else:
                assert not sess._use_fused_chunk
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
    assert texts["fused"] == texts["vmapped"], texts
    assert texts["fused_k2"] == texts["vmapped"], texts


def test_sq_fused_chunk_under_mesh_matches_single():
    """With a registered active mesh the whole sq chunk stack (incl. the
    reduce/recover array math) runs through ONE shard_map; outputs must
    match the single-device fused route exactly."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.parallel.mesh import active_mesh, make_mesh

    model, variables = _make_model()
    N, W, C = 8, 67, 32
    rs = np.random.RandomState(11)
    xs = jnp.asarray(rs.standard_normal((N, W, FEAT)) * 0.5, jnp.float32)
    offsets = jnp.asarray([0, 16, 48, 8, 0, 32, 16, 64], jnp.int32)
    cache_lens = jnp.minimum(offsets, C)
    Lyr, h, d_k = ENC["num_blocks"], 2, 16
    att = jnp.asarray(rs.standard_normal((Lyr, N, h, C, 2 * d_k)) * 0.3,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((Lyr, N, 6, 32)) * 0.2,
                      jnp.float32)
    cl.FORCE_ON_CPU = True
    try:
        packed = model.apply(variables, C,
                             method=type(model).pack_chunk_params)

        def run(mod):
            return mod.encoder.forward_chunk_batched(
                xs, offsets, att, cnn, cache_lens, packed=packed)

        y0, a0, c0 = model.apply(variables, method=run)
        with active_mesh(make_mesh()):
            assert model.apply(variables, 16, C, N,
                               method=type(model).chunk_fused_ok)
            y1, a1, c1 = model.apply(variables, method=run)
    finally:
        cl.FORCE_ON_CPU = False
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-5, atol=1e-5)
