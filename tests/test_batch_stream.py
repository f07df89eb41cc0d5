"""Batched streaming sessions: N concurrent streams through one vmapped
chunk step; each slot's transcript must equal the single-stream result."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.inference_model import InferencePredictor
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.registry import build_model
    from masr_tpu.models.cmvn import GlobalCMVN

    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "天", "<space>", "<eos>"]
    out = tmp_path_factory.mktemp("bs_bundle")
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
    save_inference_bundle(str(out), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    predictor = MASRPredictor(str(out), decoder="ctc_greedy", warmup=False)
    return predictor


def _wave(seed, seconds=1.5):
    rs = np.random.RandomState(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * (200 + 100 * seed) * t)
            + 0.02 * rs.standard_normal(n)).astype(np.float32)


def test_batch_session_matches_single_stream(setup):
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    session = BatchStreamSession(
        predictor.predictor, predictor._text_featurizer.vocab_list,
        preprocess_conf=predictor.predictor.meta["preprocess_conf"],
        max_streams=4)

    waves = [_wave(s) for s in range(3)]
    # single-stream ground truth
    singles = []
    for w in waves:
        r = predictor.predict_stream(w, is_end=True, sample_rate=16000)
        predictor.reset_stream()
        singles.append(r["text"])

    # three concurrent slots, interleaved 0.25 s feeds
    slots = [session.open() for _ in range(3)]
    results = [None] * 3
    step = 4000
    n_pieces = max(len(w) for w in waves) // step + 1
    for i in range(n_pieces):
        for k, slot in enumerate(slots):
            piece = waves[k][i * step:(i + 1) * step]
            if len(piece) == 0:
                continue
            is_end = (i + 1) * step >= len(waves[k])
            out = session.feed(slot, piece, is_end=is_end)
            if out is not None:
                results[k] = out["text"]
    for k in range(3):
        assert results[k] == singles[k], \
            f"slot {k}: batched '{results[k]}' != single '{singles[k]}'"
    for slot in slots:
        session.close(slot)


def test_batch_session_slot_reuse_and_isolation(setup):
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    session = BatchStreamSession(
        predictor.predictor, predictor._text_featurizer.vocab_list,
        preprocess_conf=predictor.predictor.meta["preprocess_conf"],
        max_streams=2)
    w = _wave(1)
    s1 = session.open()
    r1 = session.feed(s1, w, is_end=True)
    session.close(s1)
    # reopened slot must start fresh and reproduce the same text
    s2 = session.open()
    assert s2 == s1
    r2 = session.feed(s2, w, is_end=True)
    session.close(s2)
    assert r1["text"] == r2["text"]


def test_feed_many_batches_aligned_streams(setup):
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    session = BatchStreamSession(
        predictor.predictor, predictor._text_featurizer.vocab_list,
        preprocess_conf=predictor.predictor.meta["preprocess_conf"],
        max_streams=4)
    waves = [_wave(s + 10) for s in range(2)]
    singles = []
    for w in waves:
        r = predictor.predict_stream(w, is_end=True, sample_rate=16000)
        predictor.reset_stream()
        singles.append(r["text"])
    slots = [session.open() for _ in range(2)]
    results = [None, None]
    step = 8000
    for i in range(len(waves[0]) // step + 1):
        items = []
        for k, slot in enumerate(slots):
            piece = waves[k][i * step:(i + 1) * step]
            if len(piece):
                items.append((slot, piece,
                              (i + 1) * step >= len(waves[k])))
        if not items:
            continue
        out = session.feed_many(items)
        for k, slot in enumerate(slots):
            if out.get(slot) is not None:
                results[k] = out[slot]["text"]
    assert results == singles


def test_batch_session_fused_chunk_matches_vmapped(setup):
    """The fused batched chunk step (ops/pallas/chunk_layer.py, routed
    when chunk_fused_ok) must reproduce the vmapped engine's transcripts
    for interleaved streams with different start offsets."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.infer.batch_stream import BatchStreamSession
    predictor = setup
    kw = dict(preprocess_conf=predictor.predictor.meta["preprocess_conf"],
              max_streams=4)
    base = BatchStreamSession(predictor.predictor,
                              predictor._text_featurizer.vocab_list, **kw)
    assert not base._use_fused_chunk      # CPU backend without the force
    cl.FORCE_ON_CPU = True
    try:
        fused = BatchStreamSession(
            predictor.predictor, predictor._text_featurizer.vocab_list,
            **kw)
        assert fused._use_fused_chunk
        # at these shapes the RING-cache route must engage (per-layer
        # kernels write only the fresh rows; ops/pallas/chunk_layer.py
        # ring mode); transcripts below prove its parity
        assert fused._ring
        waves = [_wave(s + 20) for s in range(3)]
        texts = {"base": [None] * 3, "fused": [None] * 3}
        for name, sess in (("base", base), ("fused", fused)):
            slots = [sess.open() for _ in range(3)]
            step = 4000
            n_pieces = max(len(w) for w in waves) // step + 1
            for i in range(n_pieces + len(slots)):  # + stagger tail
                for k, slot in enumerate(slots):
                    if name == "fused" and i < k:
                        continue          # stagger starts in the fused run
                    off = i - (k if name == "fused" else 0)
                    piece = waves[k][off * step:(off + 1) * step]
                    if len(piece) == 0:
                        continue
                    is_end = (off + 1) * step >= len(waves[k])
                    out = sess.feed(slot, piece, is_end=is_end)
                    if out is not None:
                        texts[name][k] = out["text"]
            for slot in slots:
                sess.close(slot)
    finally:
        cl.FORCE_ON_CPU = False
    assert texts["fused"] == texts["base"], texts
