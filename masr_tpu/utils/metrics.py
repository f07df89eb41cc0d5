"""Error-rate metrics (parity: masr/utils/metrics.py).

cer: character error rate = levenshtein(ref, hyp) / len(ref).
wer: word error rate — words are mapped to single private-use-area code
points so the same character-level edit distance can be reused (the
reference uses the identical trick, masr/utils/metrics.py:17-29).
"""
import Levenshtein


def _edit_distance(ref: str, hyp: str) -> int:
    return Levenshtein.distance(ref, hyp)


def cer(reference: str, hypothesis: str, ignore_case: bool = False,
        remove_space: bool = True) -> float:
    if ignore_case:
        reference, hypothesis = reference.lower(), hypothesis.lower()
    if remove_space:
        reference = reference.replace(" ", "")
        hypothesis = hypothesis.replace(" ", "")
    if len(reference) == 0:
        raise ValueError("empty reference string in cer()")
    return _edit_distance(reference, hypothesis) / len(reference)


def wer(reference: str, hypothesis: str, ignore_case: bool = False,
        delimiter: str = " ") -> float:
    if ignore_case:
        reference, hypothesis = reference.lower(), hypothesis.lower()
    ref_words = reference.split(delimiter)
    hyp_words = hypothesis.split(delimiter)
    if len(ref_words) == 0:
        raise ValueError("empty reference string in wer()")
    vocab = {}

    def to_chars(words):
        out = []
        for w in words:
            if w not in vocab:
                vocab[w] = chr(0xE000 + len(vocab))  # private use area
            out.append(vocab[w])
        return "".join(out)

    return _edit_distance(to_chars(ref_words), to_chars(hyp_words)) / len(ref_words)
