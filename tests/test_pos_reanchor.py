"""Long-stream positions past the table horizon (VERDICT r3 item 5):
the fused route's HBM position tables clamp at table_len − L (the old
behavior silently FROZE positions there; the reference outright crashes
at 5000 frames, conformer/embedding.py:50). The fix: exact_positions
ticks compute per-tick sinusoids from the traced offsets — correct at
ANY offset — and the batch engine flips to that program automatically
once a slot outlives the table window. These tests pin:

1. exact_positions == the table-free einsum route at offsets far past
   the table cap (the encoder level);
2. the table route DOES diverge there (why the switch exists);
3. the engine crosses the boundary losslessly: a session with a tiny
   position table produces the same transcripts as one with a huge
   table, the exact-step engages, and per-slot offset mirrors reset.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tests.chunk_common import B, c, D, F, H, C, KS, d_k, L  # noqa: F401
from tests.test_batch_stream import setup  # noqa: F401 (pytest fixture)

TAB = 256           # tiny table: cap = (256 - 80)//8*8 = 176 frames


def _encoder(rs):
    from masr_tpu.models.conformer import ConformerEncoder
    KW = dict(input_size=80, output_size=D, attention_heads=H,
              linear_units=F, num_blocks=2, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="conv2d", pos_enc_layer_type="rel_pos",
              normalize_before=True, use_cnn_module=True,
              cnn_module_kernel=KS, causal=True,
              cnn_module_norm="layer_norm")
    enc = ConformerEncoder(**KW)
    N, chunk_in = 4, 16 * 4 + 3
    xs = jnp.asarray(rs.standard_normal((N, chunk_in, 80)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0),
                  "chunk": jax.random.PRNGKey(0)},
                 xs, jnp.full((N,), chunk_in, jnp.int32),
                 decoding_chunk_size=0, num_decoding_left_chunks=-1,
                 train=False)
    att = jnp.asarray(rs.standard_normal((2, N, H, C, 2 * d_k)) * 0.1,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((2, N, KS - 1, D)) * 0.1,
                      jnp.float32)
    return enc, v, xs, att, cnn, N


def test_exact_positions_matches_einsum_past_table_cap():
    import masr_tpu.ops.pallas.conformer_layer as cl
    rs = np.random.RandomState(5)
    enc, v, xs, att, cnn, N = _encoder(rs)
    far = jnp.full((N,), TAB + 700, jnp.int32)   # way past the cap
    clens = jnp.full((N,), C, jnp.int32)

    cl.FORCE_ON_CPU = True
    try:
        def run(table, exact):
            def body(m):
                packed = m.pack_chunk_params(
                    cache_size=C if table else None, pos_table_len=TAB)
                return m.forward_chunk_batched(
                    xs, far, att, cnn, clens, packed=packed,
                    exact_positions=exact)
            return enc.apply(v, method=body)

        y_ref, a_ref, c_ref = run(table=False, exact=False)   # einsum
        y_ex, a_ex, c_ex = run(table=True, exact=True)        # forced
        np.testing.assert_allclose(np.asarray(y_ex), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(a_ex), np.asarray(a_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(c_ex), np.asarray(c_ref),
                                   rtol=2e-5, atol=2e-5)
        # the clamped table route is NOT equal out here — that silent
        # divergence is exactly what the engine's switch removes
        y_tab, _, _ = run(table=True, exact=False)
        assert np.abs(np.asarray(y_tab) - np.asarray(y_ref)).max() > 1e-3
    finally:
        cl.FORCE_ON_CPU = False


def _wave(seed, seconds):
    rs = np.random.RandomState(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    f0 = 180 + 40 * np.sin(2 * np.pi * 1.7 * t + seed)
    w = np.sin(2 * np.pi * f0 * t) * (0.4 + 0.3 * np.sin(2 * np.pi * 3 * t))
    return (w + 0.05 * rs.standard_normal(n)).astype(np.float32) * 0.5


def test_engine_crosses_table_horizon_losslessly(setup):
    """A session with a TINY position table must transcribe a stream
    that crosses the horizon identically to a session with a huge table
    (whose cap is never reached), proving the auto-switch is exact."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=2)
    cl.FORCE_ON_CPU = True
    try:
        small = BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            pos_table_len=192, **kw)
        big = BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            pos_table_len=4096, **kw)
        assert small._use_fused_chunk and small._pos_cap is not None
        # 30 s of audio = 750 post-subsampling frames ≫ the 192-row table
        wave = _wave(3, 30.0)
        texts = {}
        for name, sess in (("small", small), ("big", big)):
            slot = sess.open()
            res = None
            step = 16000
            for i in range(0, len(wave), step):
                out = sess.feed(slot, wave[i:i + step],
                                is_end=i + step >= len(wave))
                if out is not None:
                    res = out
            texts[name] = res["text"] if res else ""
            if name == "small":
                # the exact-positions program must actually have engaged
                assert sess._slot_frames[slot] > sess._pos_cap
            sess.close(slot)
            assert sess._slot_frames[slot] == 0
        assert texts["small"] == texts["big"]
        assert len(texts["small"]) > 0
    finally:
        cl.FORCE_ON_CPU = False


def test_mixed_tick_per_slot_positions(setup):
    """VERDICT r4 item 4: a tick whose batch holds one slot PAST the
    table horizon and one inside it must dispatch the exact program for
    the crossed slot ONLY — co-scheduled fresh streams keep the fast
    table route. Pinned: transcripts from the mixed session == an
    all-table session (huge table, horizon never reached) == an
    (almost) all-exact session (tiny cap, both slots cross
    immediately), fed identically; and the mixed session really issued
    a two-group tick (one table dispatch + one exact dispatch)."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=2)
    # L = cache_size(256) + chunk(16) = 272 →
    #   512-row table: cap = (512-272)//8*8 = 240 frames (A crosses, B not)
    #   288-row table: cap = 16 (both cross by their second tick)
    #   4096-row table: cap ≈ 3824 (never crossed)
    wave_a1 = _wave(3, 12.0)     # 300 frames ≫ 240: A crosses in phase 1
    wave_a2 = _wave(4, 6.0)
    wave_b = _wave(9, 6.0)       # 150 frames < 240: B stays on the table

    def run(sess, spy=False):
        ticks = []
        if spy:
            orig_round, orig_disp = sess._run_round, sess._dispatch

            def round_spy(xs, active, valids):
                ticks.append([])
                return orig_round(xs, active, valids)

            def disp_spy(xs, active, valids, exact):
                ticks[-1].append(
                    (int(np.asarray(active).sum()), bool(exact)))
                return orig_disp(xs, active, valids, exact)
            sess._run_round, sess._dispatch = round_spy, disp_spy
        texts = {}
        a = sess.open()
        step = 32000
        for i in range(0, len(wave_a1), step):
            sess.feed_many([(a, wave_a1[i:i + step], False)])
        b = sess.open()
        for i in range(0, len(wave_b), step):
            is_end = i + step >= len(wave_b)
            r = sess.feed_many([(a, wave_a2[i:i + step], is_end),
                                (b, wave_b[i:i + step], is_end)])
            for s, v in r.items():
                if v:
                    texts[s] = v["text"]
        out = (texts.get(a, ""), texts.get(b, ""))
        sess.close(a)
        sess.close(b)
        return out, ticks

    cl.FORCE_ON_CPU = True
    try:
        mixed_sess = BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            pos_table_len=512, **kw)
        assert mixed_sess._pos_cap == 240
        mixed, ticks = run(mixed_sess, spy=True)
        table, _ = run(BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            pos_table_len=4096, **kw))
        exact, _ = run(BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            pos_table_len=288, **kw))
        # at least one genuinely mixed tick: two disjoint single-slot
        # dispatches, one exact and one on the table route
        assert any(sorted(t) == [(1, False), (1, True)] for t in ticks), \
            ticks
        assert mixed == table == exact
        assert mixed[0] and mixed[1]
    finally:
        cl.FORCE_ON_CPU = False
