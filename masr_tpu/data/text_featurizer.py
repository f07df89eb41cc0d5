"""Character-level text featurizer (parity: featurizer/text_featurizer.py).

Vocab file format: one `token\tcount` (or bare token) per line. Layout
written by create_data: <blank> (id 0), <unk>, chars by descending
frequency, <eos> last; sos == eos == vocab_size-1, blank == 0,
CTC pad/ignore id == -1 (trainer.py:480-488, conformer/model.py:54-55).
"""

BLANK_TOKEN = "<blank>"
UNK_TOKEN = "<unk>"
EOS_TOKEN = "<eos>"
SPACE_TOKEN = "<space>"


class TextFeaturizer(object):
    def __init__(self, vocab_filepath):
        self.unk = UNK_TOKEN
        self._vocab_dict, self._vocab_list = self._load_vocab(vocab_filepath)

    def featurize(self, text):
        """text → list of char-level token ids; ' '→<space>, OOV→<unk>."""
        ids = []
        for token in list(text.strip()):
            if token == " ":
                token = SPACE_TOKEN
            if token not in self._vocab_dict:
                token = self.unk
            ids.append(self._vocab_dict[token])
        return ids

    def detokenize(self, ids):
        """token ids → text; <space>→' ' (used by the decoders)."""
        out = []
        for i in ids:
            tok = self._vocab_list[int(i)]
            out.append(" " if tok == SPACE_TOKEN else tok)
        return "".join(out)

    @property
    def vocab_size(self):
        return len(self._vocab_list)

    @property
    def vocab_list(self):
        return list(self._vocab_list)

    @property
    def blank_id(self):
        return 0

    @property
    def eos_id(self):
        return len(self._vocab_list) - 1

    @staticmethod
    def _load_vocab(vocab_filepath):
        vocab_list = []
        with open(vocab_filepath, "r", encoding="utf-8") as f:
            for line in f:
                tok = line.rstrip("\n").split("\t")[0]
                if tok:
                    vocab_list.append(tok)
        vocab_dict = {tok: i for i, tok in enumerate(vocab_list)}
        return vocab_dict, vocab_list
