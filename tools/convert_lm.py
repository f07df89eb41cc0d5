"""Language-model migration tool (VERDICT r1 item 6).

The reference decodes with KenLM binaries (.klm, auto-downloaded 2.8 GB zh
model, masr/decoders/beam_search_decoder.py:19-29). This framework's
native C++ decoder reads ARPA text; BOTH KenLM binary formats (probing
hash and reversed-suffix trie) also score directly at runtime through the
in-repo readers (masr_tpu/decoders/klm_probing.py / klm_trie.py,
dispatched by the header's model_type; the `kenlm` pip package is
preferred automatically when installed — decoders/scorer.py KenlmScorer).
This tool covers the offline part of the migration:

  --inspect model.klm     Identify a KenLM binary (magic header) and print
                          the migration options. Probing-format binaries
                          store only n-gram hashes — ARPA reconstruction is
                          information-theoretically impossible (KenLM
                          itself ships no dump tool); the standard zh/en
                          LMs all have ARPA mirrors.
  --filter in.arpa(.gz) --vocab vocabulary.txt --output out.arpa
                          Vocabulary-filter an ARPA LM (the kenlm `filter`
                          equivalent): keep only n-grams whose words are
                          in the model's vocab. Turns a multi-GB
                          general-domain ARPA into a decoder-sized one.
  --validate lm.arpa      Load with the native scorer's parser and print
                          order/counts (sanity check before deployment).

Usage:
  python tools/convert_lm.py --inspect lm/zh_giga.klm
  python tools/convert_lm.py --filter zh_giga.arpa --vocab dataset/vocabulary.txt --output lm/zh_filtered.arpa
"""
import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from masr_tpu.decoders.scorer import KENLM_MAGIC, ArpaLM, is_kenlm_binary  # noqa: E402

SPECIALS = {"<s>", "</s>", "<unk>", "<UNK>"}


def inspect(path):
    if not is_kenlm_binary(path):
        print(f"{path}: NOT a KenLM binary (no magic header). "
              f"If it is ARPA text, use it directly or --validate it.")
        return 1
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(96)
    version = head[len(KENLM_MAGIC):head.index(b"\n")].strip().decode(
        "ascii", "replace")
    print(f"{path}: KenLM binary, format version {version}, "
          f"{size / 1e9:.2f} GB")
    print("""
Migration options (in order of preference):
 1. Runtime use, no conversion: keep `language_model_path` pointing at
    this .klm — both PROBING (KenLM's default) and TRIE binaries score
    through the in-repo readers (masr_tpu/decoders/klm_probing.py /
    klm_trie.py), or through the `kenlm` package if installed.
 2. Use the ARPA mirror: the standard MASR/PaddleSpeech LMs are published
    in both forms (e.g. zh_giga.no_cna_cmn.prune01244.arpa.gz); filter it
    to your vocabulary with this tool, then the native C++ decoder reads
    it with no extra dependency.
 3. Rebuild from your corpus: kenlm `lmplz -o 5 <corpus >lm.arpa`
    (tools/create_kenlm_corpus.py builds the corpus from manifests).
Note: probing-format binaries store only n-gram HASHES — reconstructing
the ARPA from this file is impossible by design; that is why no
.klm→ARPA dump tool exists anywhere.""")
    return 0


def read_vocab(path):
    vocab = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            tok = line.rstrip("\n").split("\t")[0]
            if tok and not (tok.startswith("<") and tok.endswith(">")):
                vocab.add(tok)
    return vocab


def filter_arpa(in_path, vocab_path, out_path):
    """Keep n-grams whose words ⊆ vocab ∪ specials; rewrite counts."""
    vocab = read_vocab(vocab_path)
    keep = vocab | SPECIALS
    opener = gzip.open if in_path.endswith(".gz") else open
    sections = {}  # order -> list of lines
    order = None
    with opener(in_path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            s = line.strip()
            if s.startswith("\\") and "grams:" in s:
                order = int(s[1:s.index("-")])
                sections[order] = []
                continue
            if s in ("\\data\\", "\\end\\") or s.startswith("ngram") or not s:
                continue
            if order is None:
                continue
            parts = s.split("\t")
            if len(parts) < 2:
                continue
            words = parts[1].split()
            if all(w in keep for w in words):
                sections[order].append(s)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for o in sorted(sections):
            f.write(f"ngram {o}={len(sections[o])}\n")
        for o in sorted(sections):
            f.write(f"\n\\{o}-grams:\n")
            for line in sections[o]:
                f.write(line + "\n")
        f.write("\n\\end\\\n")
    counts = {o: len(v) for o, v in sections.items()}
    print(f"filtered {in_path} -> {out_path}: "
          f"{sum(counts.values())} n-grams kept {counts}")
    return 0


def validate(path):
    lm = ArpaLM(path)
    per_order = {}
    for words in lm.ngrams:
        per_order[len(words)] = per_order.get(len(words), 0) + 1
    print(f"{path}: order {lm.order}, n-grams per order {per_order}")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--inspect", help="KenLM binary to identify")
    ap.add_argument("--filter", help="input ARPA(.gz) to vocabulary-filter")
    ap.add_argument("--vocab", help="vocabulary.txt (token[\\tcount] lines)")
    ap.add_argument("--output", help="output ARPA path")
    ap.add_argument("--validate", help="ARPA file to parse-check")
    ap.add_argument("--to-probing", dest="to_probing",
                    help="input ARPA(.gz) to export as a PROBING-format "
                         ".klm (scored by the in-repo reader; written to "
                         "kenlm's documented layout but byte-compat with "
                         "the kenlm library is unverified here — "
                         "docs/design_deviations.md #6)")
    ap.add_argument("--to-trie", dest="to_trie",
                    help="input ARPA(.gz) to export as a TRIE-format "
                         ".klm (smaller; scored by the in-repo reader; "
                         "kenlm byte-compat unverified here — "
                         "docs/design_deviations.md #6)")
    args = ap.parse_args()
    if args.inspect:
        return inspect(args.inspect)
    if args.filter:
        if not (args.vocab and args.output):
            ap.error("--filter requires --vocab and --output")
        return filter_arpa(args.filter, args.vocab, args.output)
    if args.to_probing:
        if not args.output:
            ap.error("--to-probing requires --output")
        from masr_tpu.decoders.klm_probing import write_probing
        vocab = write_probing(args.to_probing, args.output)
        print(f"wrote probing binary {args.output}: {len(vocab)} words, "
              f"{os.path.getsize(args.output) / 1e6:.1f} MB")
        return 0
    if args.to_trie:
        if not args.output:
            ap.error("--to-trie requires --output")
        from masr_tpu.decoders.klm_trie import write_trie
        vocab = write_trie(args.to_trie, args.output)
        print(f"wrote trie binary {args.output}: {len(vocab)} words, "
              f"{os.path.getsize(args.output) / 1e6:.1f} MB")
        return 0
    if args.validate:
        return validate(args.validate)
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
