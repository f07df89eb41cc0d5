"""Native C++ beam search: build, agreement with the Python engine, LM
fusion, streaming chunk parity, and speed sanity."""
import time

import numpy as np
import pytest

VOCAB = ["<blank>", "<unk>", "a", "b", "c", "<space>", "<eos>"]

native = pytest.importorskip("masr_tpu.decoders.native")


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()
    native.get_lib()


def _rand_probs(T, seed=0, V=len(VOCAB)):
    rs = np.random.RandomState(seed)
    logits = rs.standard_normal((T, V)).astype(np.float32) * 2
    return np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)


def test_native_matches_python_engine():
    from masr_tpu.decoders.beam_search import BeamSearchDecoder
    probs = _rand_probs(20, seed=1)
    nat = BeamSearchDecoder(VOCAB, beam_size=16, use_native=True)
    py = BeamSearchDecoder(VOCAB, beam_size=16, use_native=False)
    assert nat._native is not None, "native engine failed to load"
    s1, t1 = nat.decode_beam_search_offline(probs)
    s2, t2 = py.decode_beam_search_offline(probs)
    assert t1 == t2
    assert abs(s1 - s2) < 1e-4


def test_native_streaming_matches_offline():
    from masr_tpu.decoders.beam_search import BeamSearchDecoder
    probs = _rand_probs(18, seed=2)
    dec = BeamSearchDecoder(VOCAB, beam_size=16)
    off_s, off_t = dec.decode_beam_search_offline(probs)
    dec2 = BeamSearchDecoder(VOCAB, beam_size=16)
    for i in range(0, 18, 5):
        s, t = dec2.decode_chunk(probs[i:i + 5])
    assert t == off_t
    assert abs(s - off_s) < 1e-4
    dec2.reset_state()
    s3, t3 = dec2.decode_chunk(probs[:5])
    # after reset the prefix restarts
    dec3 = BeamSearchDecoder(VOCAB, beam_size=16)
    s4, t4 = dec3.decode_chunk(probs[:5])
    assert t3 == t4


def test_native_with_arpa_lm(tmp_path):
    arpa = """\\data\\
ngram 1=4
ngram 2=1

\\1-grams:
-5.0\t<unk>
-0.8\ta\t0.0
-0.8\tb\t0.0
-3.0\tc

\\2-grams:
-0.05\ta b

\\end\\
"""
    p = tmp_path / "lm.arpa"
    p.write_text(arpa)
    from masr_tpu.decoders.beam_search import BeamSearchDecoder
    probs = np.array([
        [0.05, 0.0, 0.9, 0.02, 0.03, 0.0, 0.0],
        [0.05, 0.0, 0.0, 0.44, 0.51, 0.0, 0.0],
    ], np.float32)
    no_lm = BeamSearchDecoder(VOCAB, beam_size=8)
    _, t0 = no_lm.decode_beam_search_offline(probs)
    assert t0 == "ac"
    with_lm = BeamSearchDecoder(VOCAB, alpha=1.0, beta=0.0, beam_size=8,
                                language_model_path=str(p))
    assert with_lm._native_scorer is not None
    assert with_lm._native_scorer.is_character_based
    _, t1 = with_lm.decode_beam_search_offline(probs)
    assert t1 == "ab"
    # native LM decode must agree with the python LM engine
    py_lm = BeamSearchDecoder(VOCAB, alpha=1.0, beta=0.0, beam_size=8,
                              language_model_path=str(p), use_native=False)
    s_py, t_py = py_lm.decode_beam_search_offline(probs)
    s_nat, t_nat = with_lm.decode_beam_search_offline(probs)
    assert t_py == t_nat
    assert abs(s_py - s_nat) < 1e-4


def test_native_speedup():
    """The C++ engine must beat the Python engine by a wide margin at a
    realistic beam (this is why the component is native, SURVEY.md §2.16)."""
    from masr_tpu.decoders.beam_search import BeamSearchDecoder
    V = 200
    probs = _rand_probs(100, seed=3, V=V)
    vocab = ["<blank>", "<unk>"] + [chr(0x4E00 + i) for i in range(V - 3)] + ["<eos>"]
    nat = BeamSearchDecoder(vocab, beam_size=64, cutoff_top_n=20)
    py = BeamSearchDecoder(vocab, beam_size=64, cutoff_top_n=20,
                           use_native=False)
    t0 = time.perf_counter()
    nat.decode_beam_search_offline(probs)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    py.decode_beam_search_offline(probs)
    t_py = time.perf_counter() - t0
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than python {t_py:.3f}s"
    assert t_nat * 3 < t_py  # at least 3x (typically 30x+)


def test_batch_decode_threads():
    from masr_tpu.decoders.beam_search import BeamSearchDecoder
    dec = BeamSearchDecoder(VOCAB, beam_size=8, num_processes=4)
    batch = [_rand_probs(12, seed=i) for i in range(6)]
    results = dec.decode_batch_beam_search_offline(batch)
    assert len(results) == 6
    singles = [dec.decode_beam_search_offline(p) for p in batch]
    assert [t for _, t in results] == [t for _, t in singles]
