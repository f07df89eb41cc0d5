"""In-repo KenLM PROBING binary support (VERDICT r2 item 5): the writer
builds a .klm from ARPA, the mmap reader scores it, and round-trip
scores match the ARPA scorer exactly — including backoff chains, OOV
words, and state threading. KenlmScorer falls back to this reader when
the `kenlm` package is absent (it is, in this image)."""
import itertools

import numpy as np
import pytest

from masr_tpu.decoders.klm_probing import (
    MAGIC, ProbingModel, State, murmur64a, write_probing)
from masr_tpu.decoders.scorer import ArpaLM, KenlmScorer, Scorer, \
    is_kenlm_binary

ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.4\t你\t-0.3
-0.5\t好\t-0.3
-2.2\t天\t-0.3
-1.0\t气\t-0.3
-3.0\t<unk>
-0.4\t<s>\t-0.3

\\2-grams:
-0.05\t你 好
-2.6\t你 天
-0.4\t好 你
-0.5\t好 气

\\end\\
"""


@pytest.fixture()
def klm_path(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA, encoding="utf-8")
    out = tmp_path / "lm.klm"
    write_probing(str(arpa), str(out))
    return str(out), str(arpa)


def test_murmur64a_reference_vectors():
    """MurmurHash64A seed-0 vectors, verified against a gcc build of the
    canonical public-domain C implementation (Austin Appleby) — vocab
    lookup dies instantly if this drifts."""
    assert murmur64a(b"") == 0
    assert murmur64a(b"a") == 510903276987443985
    assert murmur64a(b"abc") == 11297775770902552315
    assert murmur64a(b"hello world") == 15256545620076441550
    assert murmur64a(b"<s>") == 33080154819493488
    assert murmur64a(b"<unk>") == 16902545233577457963
    assert murmur64a("你".encode("utf-8")) == 17630163719658166804


def test_written_file_is_kenlm_binary(klm_path):
    klm, _ = klm_path
    assert is_kenlm_binary(klm)
    with open(klm, "rb") as f:
        assert f.read(len(MAGIC) - 2) == MAGIC[:-2]


def test_roundtrip_matches_arpa_scorer(klm_path):
    klm, arpa = klm_path
    ref = ArpaLM(arpa)
    m = ProbingModel(klm)
    assert m.order == 2
    words = ["你", "好", "天", "气", "怪"]       # 怪 is OOV
    for ctx_len in (0, 1, 2):
        for ctx in itertools.product(words, repeat=ctx_len):
            for w in words:
                want = ref.log10_cond(list(ctx), w)
                st = State()
                m.NullContextWrite(st)
                for c in ctx:
                    nxt = State()
                    m.BaseScore(st, c, nxt)
                    st = nxt
                out = State()
                got = m.BaseScore(st, w, out)
                np.testing.assert_allclose(
                    got, want, atol=1e-6,
                    err_msg=f"ctx={ctx} w={w}")


def _random_arpa(tmp_path, order=3, nwords=40, seed=0):
    """Random ARPA honoring the prefix/suffix closure a real LM has."""
    rs = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(nwords)]
    uni = {(w,): (float(-1 - 3 * rs.rand()), float(-0.5 * rs.rand()))
           for w in words}
    uni[("<unk>",)] = (-5.0, 0.0)
    uni[("<s>",)] = (-2.0, float(-0.5 * rs.rand()))
    uni[("</s>",)] = (-2.5, 0.0)
    bi = {}
    pool = words + ["<s>", "</s>"]
    for _ in range(nwords * 6):
        a, b = pool[rs.randint(len(pool))], pool[rs.randint(len(pool))]
        bi[(a, b)] = (float(-1 - 2 * rs.rand()), float(-0.4 * rs.rand()))
    tri = {}
    bikeys = list(bi)
    for _ in range(nwords * 6):
        (a, b) = bikeys[rs.randint(len(bikeys))]
        c = pool[rs.randint(len(pool))]
        if (b, c) in bi:                       # suffix must exist
            tri[(a, b, c)] = (float(-0.5 - 2 * rs.rand()), 0.0)
    lines = ["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bi)}",
             f"ngram 3={len(tri)}", "", "\\1-grams:"]
    for k, (p, bo) in uni.items():
        lines.append(f"{p}\t{k[0]}\t{bo}" if bo else f"{p}\t{k[0]}")
    lines.append("")
    lines.append("\\2-grams:")
    for k, (p, bo) in bi.items():
        lines.append(f"{p}\t{' '.join(k)}\t{bo}")
    lines.append("")
    lines.append("\\3-grams:")
    for k, (p, _) in tri.items():
        lines.append(f"{p}\t{' '.join(k)}")
    lines += ["", "\\end\\", ""]
    p = tmp_path / "rand.arpa"
    p.write_text("\n".join(lines), encoding="utf-8")
    return str(p), words


def test_random_trigram_roundtrip(tmp_path):
    arpa, words = _random_arpa(tmp_path)
    klm = tmp_path / "rand.klm"
    write_probing(arpa, str(klm))
    ref = ArpaLM(arpa)
    m = ProbingModel(str(klm))
    assert m.order == 3
    rs = np.random.RandomState(1)
    for _ in range(300):
        ctx = [words[rs.randint(len(words))]
               for _ in range(rs.randint(0, 4))]
        w = words[rs.randint(len(words))]
        want = ref.log10_cond(ctx, w)
        st = State()
        m.NullContextWrite(st)
        for c in ctx:
            nxt = State()
            m.BaseScore(st, c, nxt)
            st = nxt
        out = State()
        got = m.BaseScore(st, w, out)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"ctx={ctx} w={w}")


def test_kenlm_scorer_uses_inrepo_reader(klm_path):
    """`import kenlm` fails in this image, so KenlmScorer must route
    through ProbingModel and agree with the ARPA Scorer."""
    klm, arpa = klm_path
    with pytest.raises(ImportError):
        import kenlm  # noqa: F401
    ks = KenlmScorer(0.9, 0.1, klm)
    assert isinstance(ks.model, ProbingModel)
    assert ks.is_character_based
    ref = Scorer(0.9, 0.1, arpa)
    for ctx, w in [([], "你"), (["你"], "好"), (["好"], "气"),
                   (["天", "你"], "天"), (["怪"], "你")]:
        np.testing.assert_allclose(ks.score_word(ctx, w),
                                   ref.score_word(ctx, w), atol=1e-6)


def test_trie_format_routes_to_trie_reader(tmp_path, klm_path):
    klm, _ = klm_path
    blob = bytearray(open(klm, "rb").read())
    import struct
    struct.pack_into("<i", blob, 88 + 8, 2)     # model_type=TRIE
    bad = tmp_path / "trie.klm"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="TRIE"):
        ProbingModel(str(bad))               # strict per-format readers


# ------------------------------------------------------------------ #
# TRIE format (VERDICT r3 item 8 — decoders/klm_trie.py)
# ------------------------------------------------------------------ #


@pytest.fixture()
def trie_path(tmp_path):
    from masr_tpu.decoders.klm_trie import write_trie
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA, encoding="utf-8")
    out = tmp_path / "lm.trie.klm"
    write_trie(str(arpa), str(out))
    return str(out), str(arpa)


def test_trie_roundtrip_matches_arpa_scorer(trie_path):
    from masr_tpu.decoders.klm_trie import TrieModel
    klm, arpa = trie_path
    ref = ArpaLM(arpa)
    m = TrieModel(klm)
    assert m.order == 2
    words = ["你", "好", "天", "气", "怪"]       # 怪 is OOV
    for ctx_len in (0, 1, 2):
        for ctx in itertools.product(words, repeat=ctx_len):
            for w in words:
                want = ref.log10_cond(list(ctx), w)
                st = State()
                m.NullContextWrite(st)
                for c in ctx:
                    nxt = State()
                    m.BaseScore(st, c, nxt)
                    st = nxt
                out = State()
                got = m.BaseScore(st, w, out)
                np.testing.assert_allclose(got, want, atol=1e-6,
                                           err_msg=f"ctx={ctx} w={w}")


def test_trie_random_trigram_roundtrip_matches_probing(tmp_path):
    """Random 3-gram ARPA → trie binary: scores must match the ARPA
    scorer AND the probing binary bit-for-bit through state threading
    (prob stored as sign-stripped float32 is exact)."""
    from masr_tpu.decoders.klm_trie import TrieModel, write_trie
    arpa, words = _random_arpa(tmp_path, seed=3)
    tri = tmp_path / "r.trie.klm"
    prb = tmp_path / "r.prob.klm"
    write_trie(arpa, str(tri))
    write_probing(arpa, str(prb))
    ref = ArpaLM(arpa)
    mt = TrieModel(str(tri))
    mp = ProbingModel(str(prb))
    assert mt.order == 3 and mt.counts == mp.counts
    rs = np.random.RandomState(4)
    for _ in range(300):
        ctx = [words[rs.randint(len(words))]
               for _ in range(rs.randint(0, 4))]
        w = words[rs.randint(len(words))]
        want = ref.log10_cond(ctx, w)
        st_t, st_p = State(), State()
        mt.NullContextWrite(st_t)
        mp.NullContextWrite(st_p)
        for c in ctx:
            nt, npr = State(), State()
            mt.BaseScore(st_t, c, nt)
            mp.BaseScore(st_p, c, npr)
            st_t, st_p = nt, npr
        got_t = mt.BaseScore(st_t, w, State())
        got_p = mp.BaseScore(st_p, w, State())
        np.testing.assert_allclose(got_t, want, atol=1e-5,
                                   err_msg=f"ctx={ctx} w={w}")
        np.testing.assert_allclose(got_t, got_p, atol=1e-6)


def test_trie_sentence_score_and_vocab(trie_path):
    from masr_tpu.decoders.klm_trie import TrieModel
    klm, _ = trie_path
    m = TrieModel(klm)
    assert "你" in m and "好" in m and "怪" not in m
    got = m.score("你 好", bos=True, eos=False)
    np.testing.assert_allclose(got, (-0.3 - 0.4) + (-0.05), atol=1e-6)


def test_load_klm_dispatches_both_formats(klm_path, trie_path):
    from masr_tpu.decoders.klm_probing import load_klm
    from masr_tpu.decoders.klm_trie import TrieModel
    assert isinstance(load_klm(klm_path[0]), ProbingModel)
    assert isinstance(load_klm(trie_path[0]), TrieModel)


def test_kenlm_scorer_reads_trie_binary(trie_path):
    klm, arpa = trie_path
    ks = KenlmScorer(0.9, 0.1, klm)
    from masr_tpu.decoders.klm_trie import TrieModel
    assert isinstance(ks.model, TrieModel)
    ref = Scorer(0.9, 0.1, arpa)
    for ctx, w in [([], "你"), (["你"], "好"), (["好"], "气"),
                   (["天", "你"], "天"), (["怪"], "你")]:
        np.testing.assert_allclose(ks.score_word(ctx, w),
                                   ref.score_word(ctx, w), atol=1e-6)


def test_sentence_score_and_contains(klm_path):
    klm, arpa = klm_path
    m = ProbingModel(klm)
    assert "你" in m and "好" in m
    assert "怪" not in m
    # <s> 你 好 </s>: bigram(你 好)=-0.05; <s> 你 backs off:
    # bo(<s>)=-0.3 + uni(你)=-0.4; 好 </s> backs off: bo(好)=-0.3 + unk→
    # </s> absent → unk? </s> not in this tiny LM → <unk> -3.0
    got = m.score("你 好", bos=True, eos=False)
    np.testing.assert_allclose(got, (-0.3 - 0.4) + (-0.05), atol=1e-6)
