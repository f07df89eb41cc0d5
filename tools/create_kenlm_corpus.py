"""Build a text corpus for n-gram LM training from the train manifest
(parity surface: reference tools/create_kenlm_corpus.py).

The output is one utterance per line (characters space-separated for
Mandarin), ready for `lmplz -o 5 < corpus.txt > lm.arpa` (KenLM) or any
ARPA-producing toolkit — the framework's native decoder reads ARPA text
directly (masr_tpu/decoders/scorer.py, native/ctc_decoders.cc).
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from masr_tpu.data.manifest import read_manifest
from masr_tpu.utils.config import add_arguments, load_config, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs',        str,  'configs/conformer.yml', "配置文件")
add_arg('output_path',    str,  'lm/corpus.txt',          "输出语料路径")
add_arg('is_character_based', bool, True, "是否字符级（中文），否则词级")
args = parser.parse_args()
print_arguments(args=args)


def main():
    configs = load_config(args.configs)
    entries = read_manifest(configs.dataset_conf.train_manifest)
    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    with open(args.output_path, "w", encoding="utf-8") as f:
        for entry in entries:
            text = entry["text"].strip()
            if not text:
                continue
            if args.is_character_based:
                f.write(" ".join(c for c in text if c != " ") + "\n")
            else:
                f.write(text + "\n")
    print(f"wrote {len(entries)} lines to {args.output_path}")


if __name__ == "__main__":
    main()
