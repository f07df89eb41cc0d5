"""Forward text normalization: Arabic numerals → Chinese reading.

The reference's corpus cleaner runs `cn2an.transform(line, "an2cn")`
(reference tools/generate_audio/generate_corpus.py:44) so TTS input and
ASR transcripts contain no Arabic digits. cn2an is an external package;
this is a native implementation of the subset the pipeline needs:

- integers with standard unit reading (万/亿 grouping, 零 insertion,
  leading 一十 → 十): 10→十, 1001→一千零一, 120000→十二万
- decimals: integer part + 点 + digit-wise fraction (3.14→三点一四)
- digit-wise reading for strings with leading zeros or >16 digits
  (phone numbers, IDs): 007→零零七
- negatives (−/- prefix → 负), percentages (50%→百分之五十), and
  fractions (3/4→四分之三), matching cn2an.transform's readings

Not covered (lines keep their digits converted but structure intact,
and generate_corpus's leftover-ASCII filter then drops them): dates
with 年/月/日 inference, ℃ and other unit suffixes.

The inverse direction (Chinese → Arabic, for ASR *output*) lives in
masr_tpu/infer/itn.py.
"""
import re

_DIGIT_CN = "零一二三四五六七八九"
_SECTION_UNITS = ["", "十", "百", "千"]
_BIG_UNITS = ["", "万", "亿", "万亿", "亿亿"]


def _section_to_cn(section):
    """0 <= section <= 9999 → Chinese, '' for 0."""
    if section == 0:
        return ""
    out = []
    zero_pending = False
    digits = []
    s = section
    while s:
        digits.append(s % 10)
        s //= 10
    for pos in range(len(digits) - 1, -1, -1):
        d = digits[pos]
        if d == 0:
            zero_pending = bool(out)
            continue
        if zero_pending:
            out.append("零")
            zero_pending = False
        out.append(_DIGIT_CN[d] + _SECTION_UNITS[pos])
    return "".join(out)


def _digits_reading(s):
    return "".join(_DIGIT_CN[int(c)] for c in s)


def num_to_cn(num_str):
    """One number token (optionally with a decimal point) → Chinese."""
    if "." in num_str:
        int_part, frac = num_str.split(".", 1)
        head = num_to_cn(int_part) if int_part else "零"
        return head + "点" + _digits_reading(frac)
    if not num_str:
        return ""
    if (len(num_str) > 1 and num_str[0] == "0") or len(num_str) > 16:
        return _digits_reading(num_str)
    n = int(num_str)
    if n == 0:
        return "零"
    sections = []
    while n:
        sections.append(n % 10000)
        n //= 10000
    out = []
    prev_sec = None
    for i in range(len(sections) - 1, -1, -1):
        sec = sections[i]
        if sec == 0:
            continue
        cn = _section_to_cn(sec)
        # 零 marks any skipped unit between spoken parts: the higher
        # section left its units place empty (1002345 → 一百万零二千…)
        # or this section leaves its thousands place empty
        # (100001 → 十万零一)
        if out and (sec < 1000 or prev_sec % 10 == 0) \
                and not out[-1].endswith("零"):
            out.append("零")
        out.append(cn + _BIG_UNITS[i])
        prev_sec = sec
    text = "".join(out)
    if text.startswith("一十"):
        text = text[1:]
    return text


_NUM_RE = re.compile(
    r"(?P<neg>[-−])?(?P<num>\d+(?:\.\d+)?)"
    r"(?:(?P<pct>%)|/(?P<den>\d+(?:\.\d+)?))?")


def _token_to_cn(m):
    num = num_to_cn(m.group("num"))
    if m.group("pct"):
        out = "百分之" + num
    elif m.group("den"):
        # a/b reads denominator-first: 3/4 → 四分之三
        out = num_to_cn(m.group("den")) + "分之" + num
    else:
        out = num
    return ("负" + out) if m.group("neg") else out


def an2cn(text):
    """Replace every Arabic number in running text with its Chinese
    reading (the cn2an.transform(text, 'an2cn') subset the corpus
    pipeline needs): plain/decimal numbers, negatives, percents,
    fractions."""
    return _NUM_RE.sub(_token_to_cn, text)
