"""Punctuation restoration plugin interface
(parity surface: masr/infer_utils/pun_predictor.py — an ERNIE token
classifier behind paddle-inference in the reference; treated as an
optional plugin per SURVEY.md §2.12).

A model directory is expected to contain a `punctuation.py` exposing
`Predictor(model_dir)` with `__call__(text) -> text`, or a transformers
token-classification checkpoint (used if `transformers` is importable).
"""
import os


class PunctuationPredictor(object):
    def __init__(self, model_dir):
        self._impl = None
        plugin = os.path.join(model_dir, "punctuation.py")
        if os.path.exists(plugin):
            import importlib.util
            spec = importlib.util.spec_from_file_location("pun_plugin", plugin)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            self._impl = mod.Predictor(model_dir)
            return
        # transformers token-classifier fallback (torch CPU)
        from transformers import AutoModelForTokenClassification, AutoTokenizer
        import torch
        self._tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self._model = AutoModelForTokenClassification.from_pretrained(model_dir)
        self._model.eval()
        self._torch = torch
        self._labels = list(self._model.config.id2label.values())

    def __call__(self, text):
        if self._impl is not None:
            return self._impl(text)
        torch = self._torch
        enc = self._tokenizer(list(text), is_split_into_words=True,
                              return_tensors="pt")
        with torch.no_grad():
            logits = self._model(**enc).logits[0]
        pred = logits.argmax(-1).tolist()
        out = []
        word_ids = enc.word_ids()
        for i, wid in enumerate(word_ids):
            if wid is None:
                continue
            out.append(text[wid])
            label = self._labels[pred[i]]
            if label not in ("O", "0"):
                out.append(label)
        return "".join(out)
