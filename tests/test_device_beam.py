"""On-device batched CTC prefix beam search (SURVEY.md §2.16 north star)
must agree with the host Python prefix-beam engine — same pruning rules
(cutoff_prob=1.0, same top-K) → same best hypothesis and score."""
import numpy as np
import pytest

import jax.numpy as jnp

from masr_tpu.decoders.beam_search import _PyPrefixBeamSearch
from masr_tpu.decoders.device_beam import (ctc_beam_search_jax,
                                           decode_batch_device)

V = 12
VOCAB = ["<blank>"] + [chr(ord("a") + i) for i in range(V - 1)]


def _random_lattice(T, seed, peaky=False):
    rs = np.random.RandomState(seed)
    logits = rs.standard_normal((T, V)).astype(np.float32)
    if peaky:
        peaks = rs.randint(0, V, T)
        logits[np.arange(T), peaks] += 4.0
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _py_decode(probs, beam, K):
    eng = _PyPrefixBeamSearch(VOCAB, beam_size=beam, cutoff_prob=1.0,
                              cutoff_top_n=K, blank_id=0)
    eng.step(probs)
    return eng.result()


@pytest.mark.parametrize("seed,peaky", [(0, False), (1, False), (2, True),
                                        (3, True), (4, False)])
def test_device_beam_matches_python_engine(seed, peaky):
    probs = _random_lattice(25, seed, peaky)
    score_py, text_py = _py_decode(probs, beam=8, K=6)
    results = decode_batch_device(probs[None], np.asarray([25]), VOCAB,
                                  beam_size=8, cutoff_top_n=6)
    score_dev, text_dev = results[0]
    assert text_dev == text_py, f"{text_dev!r} != {text_py!r}"
    np.testing.assert_allclose(score_dev, score_py, rtol=1e-4, atol=1e-4)


def test_device_beam_batched_equals_per_utterance():
    lattices = [_random_lattice(20, s, s % 2 == 0) for s in range(6)]
    T = 20
    probs = np.stack(lattices)
    lens = np.full(6, T)
    batched = decode_batch_device(probs, lens, VOCAB, beam_size=8,
                                  cutoff_top_n=6)
    for b in range(6):
        single = decode_batch_device(probs[b:b + 1], lens[b:b + 1], VOCAB,
                                     beam_size=8, cutoff_top_n=6)[0]
        assert batched[b][1] == single[1]
        np.testing.assert_allclose(batched[b][0], single[0], rtol=1e-4)


def test_device_beam_respects_lens():
    """Padded frames must not contribute: decoding T=15 with 10 pad
    frames == decoding the 15-frame lattice alone."""
    probs = _random_lattice(15, 7, peaky=True)
    padded = np.concatenate(
        [probs, np.tile(_random_lattice(10, 8), (1, 1))], axis=0)
    a = decode_batch_device(padded[None], np.asarray([15]), VOCAB,
                            beam_size=8, cutoff_top_n=6)[0]
    b = decode_batch_device(probs[None], np.asarray([15]), VOCAB,
                            beam_size=8, cutoff_top_n=6)[0]
    assert a[1] == b[1]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)


def test_device_beam_nbest_ordering_and_uniqueness():
    probs = _random_lattice(25, 11)
    tokens, lengths, scores = ctc_beam_search_jax(
        jnp.asarray(probs[None]), jnp.asarray([25]), beam_size=8,
        cutoff_top_n=6)
    scores = np.asarray(scores)[0]
    assert (np.diff(scores) <= 1e-6).all()  # best-first
    # beams are distinct prefixes
    toks = np.asarray(tokens)[0]
    lens_ = np.asarray(lengths)[0]
    seen = set()
    for w in range(toks.shape[0]):
        if scores[w] < -1e8:
            continue
        key = tuple(toks[w, : lens_[w]])
        assert key not in seen, "duplicate prefix in beam"
        seen.add(key)
    # python n-best scores agree on the shared top hypotheses
    eng = _PyPrefixBeamSearch(VOCAB, beam_size=8, cutoff_prob=1.0,
                              cutoff_top_n=6, blank_id=0)
    eng.step(probs)
    py_nbest = eng.result_nbest(4)
    dev = {tuple(toks[w, : lens_[w]]): scores[w] for w in range(8)}
    for s, ids in py_nbest[:3]:
        assert tuple(ids) in dev
        np.testing.assert_allclose(dev[tuple(ids)], s, rtol=1e-4, atol=1e-4)


def test_device_beam_clear_sequence():
    """A clean peaked lattice decodes to its obvious transcript."""
    seq = [1, 1, 0, 2, 0, 3, 3, 0, 4]
    probs = np.full((len(seq), V), 0.001, np.float32)
    for t, s in enumerate(seq):
        probs[t, s] = 0.99
    probs /= probs.sum(axis=1, keepdims=True)
    (score, text), = decode_batch_device(probs[None],
                                         np.asarray([len(seq)]), VOCAB,
                                         beam_size=4, cutoff_top_n=4)
    assert text == "abcd"


# --------------------------------------------------------------------- #
# stateful chunked streaming
# --------------------------------------------------------------------- #
def test_stream_feed_matches_offline():
    from masr_tpu.decoders.device_beam import DeviceBeamStream
    probs = _random_lattice(23, 13, peaky=True)
    toks, lens_, scores = ctc_beam_search_jax(
        jnp.asarray(probs[None]), jnp.asarray([23]), beam_size=8,
        cutoff_top_n=6)
    stream = DeviceBeamStream(batch=1, beam_size=8, cutoff_top_n=6,
                              max_len=32)
    # ragged chunks incl. a padded final one
    for i in range(0, 23, 5):
        chunk = probs[i:i + 5]
        valid = np.ones((1, chunk.shape[0]), bool)
        if chunk.shape[0] < 5:
            pad = 5 - chunk.shape[0]
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
            valid = np.pad(valid, ((0, 0), (0, pad)))
        stream.feed(chunk[None], valid)
    ids, score = stream.best(0)
    want = list(np.asarray(toks)[0, 0, : int(lens_[0, 0])])
    assert ids == want
    np.testing.assert_allclose(score, float(scores[0, 0]), rtol=1e-5)


def test_stream_slot_isolation():
    from masr_tpu.decoders.device_beam import DeviceBeamStream
    la = _random_lattice(20, 21, peaky=True)
    lb = _random_lattice(20, 22, peaky=True)
    stream = DeviceBeamStream(batch=3, beam_size=8, cutoff_top_n=6,
                              max_len=32)
    # slot 0 gets lattice A, slot 2 gets lattice B on a different cadence,
    # slot 1 stays idle
    for i in range(0, 20, 4):
        fv = np.zeros((3, 4), bool)
        chunk = np.zeros((3, 4, V), np.float32)
        chunk[0] = la[i:i + 4]
        fv[0] = True
        stream.feed(chunk, fv)
        if i % 8 == 0:
            part = lb[i:i + 8]
            fv2 = np.zeros((3, 8), bool)
            c2 = np.zeros((3, 8, V), np.float32)
            c2[2, : len(part)] = part
            fv2[2, : len(part)] = True
            stream.feed(c2, fv2)
    ids_a, score_a = stream.best(0)
    ids_b, score_b = stream.best(2)
    ids_idle, score_idle = stream.best(1)
    # solo references
    ra = decode_batch_device(la[None], np.asarray([20]), VOCAB,
                             beam_size=8, cutoff_top_n=6)[0]
    rb = decode_batch_device(lb[None], np.asarray([20]), VOCAB,
                             beam_size=8, cutoff_top_n=6)[0]
    to_text = lambda ids: "".join(VOCAB[i] for i in ids)
    assert to_text(ids_a) == ra[1]
    assert to_text(ids_b) == rb[1]
    assert ids_idle == []  # untouched slot
    # reset isolates too
    stream.reset_slots([0])
    assert stream.best(0)[0] == []
    assert to_text(stream.best(2)[0]) == rb[1]


def test_batch_stream_session_device_beam(tmp_path):
    """BatchStreamSession(decoder='ctc_beam_search_device'): two slots fed
    the same audio produce identical text, equal to a fresh solo run."""
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.inference_model import InferencePredictor
    from masr_tpu.infer.batch_stream import BatchStreamSession
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=1, cnn_module_kernel=7)
    dec = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    out = str(tmp_path / "b")
    save_inference_bundle(out, "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    ip = InferencePredictor(model_dir=out)
    sess = BatchStreamSession(ip, vocab,
                              preprocess_conf={"feature_method": "fbank",
                                               "n_mels": FEAT},
                              max_streams=4,
                              decoder="ctc_beam_search_device",
                              decoder_conf={"beam_size": 4,
                                            "cutoff_top_n": 4})
    rs = np.random.RandomState(0)
    t = np.arange(int(1.5 * 16000)) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 350 * t)
           + 0.02 * rs.standard_normal(len(t))).astype(np.float32)
    s1, s2 = sess.open(), sess.open()
    r1 = r2 = None
    step = 8000
    for i in range(0, len(wav), step):
        end = i + step >= len(wav)
        a = sess.feed(s1, wav[i:i + step], is_end=end)
        b = sess.feed(s2, wav[i:i + step], is_end=end)
        r1, r2 = a or r1, b or r2
    assert r1 is not None and r1["text"] == r2["text"]
    sess.close(s1)
    sess.close(s2)
    # fresh slot reproduces the same text
    s3 = sess.open()
    r3 = None
    for i in range(0, len(wav), step):
        r = sess.feed(s3, wav[i:i + step], is_end=i + step >= len(wav))
        r3 = r or r3
    assert r3["text"] == r1["text"]


# --------------------------------------------------------------------- #
# on-device shallow LM fusion
# --------------------------------------------------------------------- #
ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.4\ta\t-0.3
-0.5\tb\t-0.3
-2.2\tc\t-0.3
-1.0\td\t-0.3
-3.0\t<unk>
-0.4\t<s>\t-0.3

\\2-grams:
-0.05\ta b
-2.6\ta c
-0.4\tb a
-0.5\tb d

\\end\\
"""


@pytest.fixture()
def lm_setup(tmp_path):
    from masr_tpu.decoders.device_beam import build_dense_bigram
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA, encoding="utf-8")
    table = build_dense_bigram(str(p), VOCAB)
    return str(p), table


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_device_lm_fusion_matches_python_engine(lm_setup, seed):
    from masr_tpu.decoders.scorer import Scorer
    arpa_path, table = lm_setup
    probs = _random_lattice(18, seed, peaky=True)
    scorer = Scorer(alpha=2.0, beta=0.5, language_model_path=arpa_path)
    assert scorer.is_character_based
    eng = _PyPrefixBeamSearch(VOCAB, beam_size=8, cutoff_prob=1.0,
                              cutoff_top_n=6, blank_id=0, scorer=scorer)
    eng.step(probs)
    score_py, text_py = eng.result()
    results = decode_batch_device(probs[None], np.asarray([18]), VOCAB,
                                  beam_size=8, cutoff_top_n=6,
                                  lm_table=table, alpha=2.0, beta=0.5)
    score_dev, text_dev = results[0]
    assert text_dev == text_py, f"{text_dev!r} != {text_py!r}"
    np.testing.assert_allclose(score_dev, score_py, rtol=1e-4, atol=1e-4)


def test_device_lm_fusion_flips_ambiguous(lm_setup):
    """LM strongly prefers 'ab' over 'ac': device fusion flips the
    acoustically-tilted decode, same as the host LM test."""
    _, table = lm_setup
    T = 5
    probs = np.full((T, V), 1e-6, np.float32)
    probs[0, 1] = 0.9    # a
    probs[1, 0] = 0.9
    probs[2, 2] = 0.40   # b
    probs[2, 3] = 0.50   # c (acoustically preferred, LM-dispreferred)
    probs[3, 0] = 0.9
    probs[4, 0] = 0.9
    probs /= probs.sum(axis=1, keepdims=True)
    no_lm = decode_batch_device(probs[None], np.asarray([T]), VOCAB,
                                beam_size=8, cutoff_top_n=6)[0]
    with_lm = decode_batch_device(probs[None], np.asarray([T]), VOCAB,
                                  beam_size=8, cutoff_top_n=6,
                                  lm_table=table, alpha=2.0, beta=0.0)[0]
    assert no_lm[1] == "ac"
    assert with_lm[1] == "ab"


def test_device_lm_stream_matches_offline(lm_setup):
    from masr_tpu.decoders.device_beam import DeviceBeamStream
    _, table = lm_setup
    probs = _random_lattice(20, 9, peaky=True)
    offline = decode_batch_device(probs[None], np.asarray([20]), VOCAB,
                                  beam_size=8, cutoff_top_n=6,
                                  lm_table=table, alpha=2.0, beta=0.5)[0]
    stream = DeviceBeamStream(batch=1, beam_size=8, cutoff_top_n=6,
                              max_len=32, lm_table=table, alpha=2.0,
                              beta=0.5)
    for i in range(0, 20, 4):
        stream.feed(probs[None, i:i + 4])
    ids, score = stream.best(0)
    assert "".join(VOCAB[i] for i in ids) == offline[1]
    np.testing.assert_allclose(score, offline[0], rtol=1e-5)


def test_predictor_device_beam_decoder(tmp_path):
    """MASRPredictor(decoder='ctc_beam_search_device'): batch == single,
    streaming chunking-invariant, reset isolates utterances."""
    import jax
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "<space>", "<eos>"]
    enc = dict(output_size=32, attention_heads=2, linear_units=32,
               num_blocks=1, cnn_module_kernel=7)
    dec = dict(linear_units=32, num_blocks=1, r_num_blocks=0)
    model = build_model("conformer", FEAT, len(vocab), streaming=True,
                        encoder_conf=enc, decoder_conf=dec,
                        model_conf=dict(ctc_weight=0.5),
                        cmvn=GlobalCMVN(np.zeros(FEAT), np.ones(FEAT)))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng, "chunk": rng},
        jnp.zeros((1, 67, FEAT)), jnp.asarray([67]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    out = str(tmp_path / "pb")
    save_inference_bundle(out, "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT,
                           "use_dB_normalization": False}, variables)
    p = MASRPredictor(out, decoder="ctc_beam_search_device",
                      decoder_configs={"beam_size": 4, "cutoff_top_n": 4},
                      warmup=False)
    assert p._device_beam_conf is not None
    rs = np.random.RandomState(0)
    sr = 16000
    t = np.arange(int(1.3 * sr)) / sr
    wavs = [(0.3 * np.sin(2 * np.pi * f * t)
             + 0.02 * rs.standard_normal(len(t))).astype(np.float32)
            for f in (300, 700, 1400)]
    singles = [p.predict(w, sample_rate=sr) for w in wavs]
    batch = p.predict_batch(list(wavs), sample_rate=sr)
    for s, b in zip(singles, batch):
        assert s["text"] == b["text"]
        np.testing.assert_allclose(s["score"], b["score"], rtol=1e-4)
    # streaming: whole vs pieces, reset isolates
    r_one = p.predict_stream(wavs[0], is_end=True, sample_rate=sr)
    p.reset_stream()
    r_piece = None
    step = 4000
    for i in range(0, len(wavs[0]), step):
        r = p.predict_stream(wavs[0][i:i + step],
                             is_end=i + step >= len(wavs[0]),
                             sample_rate=sr)
        r_piece = r or r_piece
    p.reset_stream()
    assert r_one["text"] == r_piece["text"]
    r_again = p.predict_stream(wavs[0], is_end=True, sample_rate=sr)
    p.reset_stream()
    assert r_again["text"] == r_one["text"]


def test_traced_alpha_beta_single_compile(lm_setup):
    """alpha/beta as traced jnp scalars: the alpha grid reuses one
    compiled program (tools/tune.py --use_device) and moves scores."""
    _, table = lm_setup
    probs = _random_lattice(15, 17, peaky=True)
    outs = {}
    for a in (0.0, 4.0):
        outs[a] = decode_batch_device(
            probs[None], np.asarray([15]), VOCAB, beam_size=8,
            cutoff_top_n=6, lm_table=table,
            alpha=jnp.float32(a), beta=jnp.float32(0.0))[0]
    # alpha=0 with beta=0 must equal the LM-free decode
    base = decode_batch_device(probs[None], np.asarray([15]), VOCAB,
                               beam_size=8, cutoff_top_n=6)[0]
    assert outs[0.0][1] == base[1]
    np.testing.assert_allclose(outs[0.0][0], base[0], rtol=1e-5)
    assert outs[4.0][0] != outs[0.0][0]
