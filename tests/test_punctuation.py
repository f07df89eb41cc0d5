"""Punctuation restoration (VERDICT r1 item 10): all three tiers execute
in-repo — rule-based default, transformers token-classifier checkpoint,
and the bring-your-own plugin."""
import os

import numpy as np
import pytest

from masr_tpu.infer.punctuation import PunctuationPredictor, RulePunctuation


# --------------------------------------------------------------------- #
# tier 3: rule-based default
# --------------------------------------------------------------------- #
def test_rule_terminal_question():
    p = RulePunctuation()
    assert p("你好吗") == "你好吗？"
    assert p("今天天气怎么样呢") == "今天天气怎么样呢？"


def test_rule_terminal_statement():
    p = RulePunctuation()
    assert p("我们走吧") == "我们走吧。"
    assert p("今天天气很好") == "今天天气很好。"


def test_rule_conjunction_comma():
    p = RulePunctuation()
    out = p("我今天去了商店但是没有买东西")
    assert "，但是" in out and out.endswith("。")
    out2 = p("他很努力所以成绩很好")
    assert "，所以" in out2


def test_rule_no_double_punctuation():
    p = RulePunctuation()
    assert p("你好。") == "你好。"  # already punctuated → untouched
    assert p("") == ""


def test_rule_length_cap_breaks_long_runs():
    p = RulePunctuation(max_run=6)
    text = "我吃了饭他也吃了饭大家都吃了饭之后去散步"
    out = p(text)
    assert "，" in out[:-1]
    # content preserved: stripping punctuation recovers the input
    assert "".join(c for c in out if c not in "，。？！") == text


def test_rule_english_sentence():
    p = RulePunctuation()
    assert p("hello") == "Hello."


def test_predictor_default_is_rule_based():
    p = PunctuationPredictor()
    assert p("你好吗") == "你好吗？"


# --------------------------------------------------------------------- #
# tier 2: transformers token-classification checkpoint
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    import torch
    d = tmp_path_factory.mktemp("pun_bert")
    chars = list("你好吗天气很大家都走吧")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + chars
    with open(d / "vocab.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(vocab))
    config = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
        id2label={0: "O", 1: "，", 2: "。", 3: "？"},
        label2id={"O": 0, "，": 1, "。": 2, "？": 3})
    torch.manual_seed(0)
    model = transformers.BertForTokenClassification(config)
    # rig the classifier so 吗 → ？ and 吧 → 。 deterministically: zero
    # everything, then bias through the embedding of those tokens
    with torch.no_grad():
        for p_ in model.parameters():
            p_.zero_()
        emb = model.bert.embeddings.word_embeddings.weight
        emb[vocab.index("吗"), 0] = 1.0
        emb[vocab.index("吧"), 1] = 1.0
        cls = model.classifier
        cls.weight.zero_()
        cls.weight[3, 0] = 10.0   # feature 0 → label ？
        cls.weight[2, 1] = 10.0   # feature 1 → label 。
        # LayerNorms were zeroed — restore scale 1 so features pass through
        for name, p_ in model.named_parameters():
            if "LayerNorm.weight" in name:
                p_.fill_(1.0)
    model.save_pretrained(d)
    tok = transformers.BertTokenizer(str(d / "vocab.txt"))
    tok.save_pretrained(d)
    return str(d)


def test_transformers_checkpoint_path(tiny_bert_dir):
    p = PunctuationPredictor(tiny_bert_dir)
    out = p("你好吗")
    # chars preserved in order; rigged classifier labels are inserted
    stripped = "".join(c for c in out if c not in "，。？")
    assert stripped == "你好吗"
    assert isinstance(out, str) and len(out) >= 3


# --------------------------------------------------------------------- #
# tier 1: bring-your-own plugin
# --------------------------------------------------------------------- #
def test_plugin_path(tmp_path):
    plugin = tmp_path / "punctuation.py"
    plugin.write_text(
        "class Predictor:\n"
        "    def __init__(self, model_dir):\n"
        "        self.model_dir = model_dir\n"
        "    def __call__(self, text):\n"
        "        return text + '！'\n", encoding="utf-8")
    p = PunctuationPredictor(str(tmp_path))
    assert p("你好") == "你好！"


# --------------------------------------------------------------------- #
# end to end: use_pun=True flows through MASRPredictor.predict
# --------------------------------------------------------------------- #
def test_use_pun_through_predictor(tmp_path):
    import jax
    import jax.numpy as jnp
    from masr_tpu.infer.bundle import save_inference_bundle
    from masr_tpu.infer.predictor import MASRPredictor
    from masr_tpu.models.cmvn import GlobalCMVN
    from masr_tpu.models.registry import build_model
    FEAT = 80
    vocab = ["<blank>", "<unk>", "你", "好", "吗", "<space>", "<eos>"]
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
    save_inference_bundle(str(tmp_path), "conformer", True, FEAT, vocab,
                          np.zeros(FEAT), np.ones(FEAT), enc, dec,
                          dict(ctc_weight=0.5),
                          {"feature_method": "fbank", "n_mels": FEAT},
                          variables)
    p = MASRPredictor(str(tmp_path), decoder="ctc_greedy", use_pun=True,
                      warmup=False)
    assert p.pun_predictor is not None
    wav = (np.random.RandomState(0).standard_normal(16000) * 0.1
           ).astype(np.float32)
    r = p.predict(wav, use_pun=True)
    assert isinstance(r["text"], str)
    if r["text"]:  # random weights may decode to empty
        assert r["text"][-1] in "。？！，" or r["text"][-1].isalnum()
