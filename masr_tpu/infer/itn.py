"""Simple Chinese inverse text normalization fallback.

The reference lazily imports WeTextProcessing's InverseNormalizer
(predict.py:356-362). When that package is absent, this minimal native
implementation converts spelled-out Chinese numbers to digits — the most
common ITN need for ASR output. It is intentionally conservative: anything
it can't parse is left untouched.
"""
import re

_DIGITS = {"零": 0, "一": 1, "二": 2, "两": 2, "三": 3, "四": 4, "五": 5,
           "六": 6, "七": 7, "八": 8, "九": 9}
_UNITS = {"十": 10, "百": 100, "千": 1000}
_BIG_UNITS = {"万": 10 ** 4, "亿": 10 ** 8}
_NUM_CHARS = "".join(_DIGITS) + "".join(_UNITS) + "".join(_BIG_UNITS) + "点"


def _parse_section(s):
    """Parse a section without 万/亿 units → int."""
    total, current = 0, 0
    for ch in s:
        if ch in _DIGITS:
            current = current * 10 + _DIGITS[ch] if current >= 10 else _DIGITS[ch]
        elif ch in _UNITS:
            total += (current if current else 1) * _UNITS[ch]
            current = 0
    return total + current


def _parse_chinese_number(s):
    if not s or s == "零":
        return 0 if s else None
    # decimal part
    if "点" in s:
        left, _, right = s.partition("点")
        ip = _parse_chinese_number(left)
        if ip is None:
            return None
        frac = "".join(str(_DIGITS.get(c, "")) for c in right)
        if not frac or any(c not in _DIGITS for c in right):
            return None
        return float(f"{ip}.{frac}")
    total = 0
    rest = s
    for ch, mult in sorted(_BIG_UNITS.items(), key=lambda kv: -kv[1]):
        if ch in rest:
            left, _, rest = rest.partition(ch)
            total += (_parse_section(left) if left else 1) * mult
    return total + _parse_section(rest)


class SimpleInverseNormalizer(object):
    _pattern = re.compile(f"[{_NUM_CHARS}]{{2,}}|[{''.join(_DIGITS)}]")

    def normalize(self, text):
        def repl(m):
            s = m.group(0)
            # pure sequences of digits read one-by-one ("一二三" → 123)
            if all(c in _DIGITS for c in s) and len(s) > 1:
                return "".join(str(_DIGITS[c]) for c in s)
            if len(s) == 1 and s in _DIGITS:
                return s  # leave single digits as characters
            val = _parse_chinese_number(s)
            if val is None:
                return s
            return str(val)

        return self._pattern.sub(repl, text)
