"""Character normalization — vectorized re-expression of the reference's
per-char folding.

Semantics source (cited for parity, not ported code):
  * per-char fold:      /root/reference/.../util/NGram.java:103-173 (normalize)
  * Vietnamese fold:    NGram.java:183-210 (normalize_vi)
  * URL / mail scrub:   Detector.java:79-80 (regexes), applied :216-217
  * space-collapse+cap: Detector.java:214-227 (append)
  * Latin purge:        Detector.java:233-261 (_cleaningText)

Instead of a per-char `switch` on Unicode blocks, we precompute a full
65,536-entry BMP codepoint → codepoint numpy lookup table once at import,
so normalizing a string is one `np.take` over its codepoints — the shape
that stays fast inside Arrow-batched pandas UDFs at 100 TB scale.
"""

from __future__ import annotations

import json
import re
import sys
import unicodedata
from importlib import resources

import numpy as np

# importlib.resources (not Path(__file__)) so the table loads when the
# package ships as a --py-files zip
_DATA = json.loads(
    resources.files("language_detection_spark.data")
    .joinpath("normalization.json")
    .read_text(encoding="utf-8")
)

SPACE = 0x20

# Unicode block ranges used by the reference's fold (java.lang.Character
# .UnicodeBlock boundaries; public Unicode data).
_BASIC_LATIN = (0x0000, 0x007F)
_LATIN1_SUPP = (0x0080, 0x00FF)
_LATIN_EXT_B = (0x0180, 0x024F)
_ARABIC = (0x0600, 0x06FF)
_LATIN_EXT_ADD = (0x1E00, 0x1EFF)
_GENERAL_PUNCT = (0x2000, 0x206F)
_HIRAGANA = (0x3040, 0x309F)
_KATAKANA = (0x30A0, 0x30FF)
_BOPOMOFO = (0x3100, 0x312F)
_BOPOMOFO_EXT = (0x31A0, 0x31BF)
_CJK_IDEOGRAPHS = (0x4E00, 0x9FFF)
_HANGUL_SYLL = (0xAC00, 0xD7AF)


def _build_fold_table() -> np.ndarray:
    t = np.arange(0x10000, dtype=np.uint32)

    def rng(lo, hi):
        return slice(lo, hi + 1)

    # Basic Latin: everything except A-Z / a-z folds to space
    bl = np.arange(_BASIC_LATIN[0], _BASIC_LATIN[1] + 1)
    keep = ((bl >= ord("A")) & (bl <= ord("Z"))) | ((bl >= ord("a")) & (bl <= ord("z")))
    t[rng(*_BASIC_LATIN)] = np.where(keep, bl, SPACE)
    # Latin-1 supplement: the excluded set folds to space
    for ch in _DATA["latin1_exclude"]:
        if _LATIN1_SUPP[0] <= ord(ch) <= _LATIN1_SUPP[1]:
            t[ord(ch)] = SPACE
    # Latin Extended-B: Romanian comma-below → cedilla
    t[0x0219] = 0x015F
    t[0x021B] = 0x0163
    # General punctuation → space
    t[rng(*_GENERAL_PUNCT)] = SPACE
    # Arabic: Farsi yeh → Arabic yeh
    t[0x06CC] = 0x064A
    # Latin Extended Additional: >= U+1EA0 → U+1EC3
    t[rng(0x1EA0, _LATIN_EXT_ADD[1])] = 0x1EC3
    # Kana / Bopomofo / Hangul representatives
    t[rng(*_HIRAGANA)] = 0x3042
    t[rng(*_KATAKANA)] = 0x30A2
    t[rng(*_BOPOMOFO)] = 0x3105
    t[rng(*_BOPOMOFO_EXT)] = 0x3105
    t[rng(*_HANGUL_SYLL)] = 0xAC00
    # CJK ideographs: frequency-class representative = first char of its class
    for cls in _DATA["cjk_kanji_classes"]:
        rep = ord(cls[0])
        for ch in cls:
            t[ord(ch)] = rep
    return t


CHAR_FOLD: np.ndarray = _build_fold_table()

# Uppercase mask for the capital-word suppression rule (NGram.java:56-64).
# Java Character.isUpperCase = category Lu OR the Other_Uppercase property
# (e.g. U+2160-216F Roman numerals, U+24B6-24CF circled letters); CPython's
# str.isupper() implements exactly the Unicode Uppercase property, so use it
# instead of a category-Lu-only test.
IS_UPPER: np.ndarray = np.zeros(0x10000, dtype=bool)
for _cp in range(0x10000):
    if chr(_cp).isupper():
        IS_UPPER[_cp] = True


_UTF16 = "utf-16-le" if sys.byteorder == "little" else "utf-16-be"


def str_to_utf16_units(s: str) -> np.ndarray:
    """UTF-16 code-unit view of a python str (mirrors Java's char indexing;
    supplementary chars appear as surrogate pairs, like the reference)."""
    if not s:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(s.encode(_UTF16, "surrogatepass"), dtype=np.uint16).astype(
        np.uint32
    )


def units_to_str(units: np.ndarray) -> str:
    if units.size == 0:
        return ""
    return units.astype(np.uint16).tobytes().decode(_UTF16, "surrogatepass")


def normalize_char(c: str) -> str:
    """Scalar fold (golden-test surface; parity with NGram.normalize)."""
    cp = ord(c)
    return chr(int(CHAR_FOLD[cp])) if cp < 0x10000 else c


def normalize_codepoints(cp: np.ndarray) -> np.ndarray:
    """Vectorized fold over a codepoint array (supplementary chars pass through)."""
    out = cp.copy()
    bmp = cp < 0x10000
    out[bmp] = CHAR_FOLD[cp[bmp]]
    return out


# --- Vietnamese composition fold (NGram.java:183-210) -----------------------

_VI_BASE = _DATA["vi_to_normalize_chars"]
_VI_DMARK = _DATA["vi_dmark_class"]
_VI_TABLES = _DATA["vi_normalized_chars"]
_VI_RE = re.compile(
    "([" + re.escape(_VI_BASE) + "])([" + re.escape(_VI_DMARK) + "])"
)


def _vi_repl(m: re.Match) -> str:
    return _VI_TABLES[_VI_DMARK.index(m.group(2))][_VI_BASE.index(m.group(1))]


def normalize_vi(text: str) -> str:
    return _VI_RE.sub(_vi_repl, text)


# --- Detector.append / _cleaningText semantics -------------------------------

URL_RE = re.compile(r"https?://[-_.?&~;+=/#0-9A-Za-z]{1,2076}")
MAIL_RE = re.compile(r"[-_.0-9A-Za-z]{1,64}@[-_0-9A-Za-z]{1,255}[-_.0-9A-Za-z]{1,255}")


def prepare_text(text: str, max_text_length: int = 10000) -> str:
    """URL/mail scrub → Vietnamese fold → scan-cap at ``max_text_length``
    source chars while collapsing runs of U+0020 (Detector.append order:
    the cap applies to the scanned index of the scrubbed+folded text)."""
    t = URL_RE.sub(" ", text)
    t = MAIL_RE.sub(" ", t)
    t = normalize_vi(t)
    if len(t) > max_text_length // 2:  # cap counts UTF-16 units (Java chars)
        b = t.encode("utf-16-le", "surrogatepass")
        if len(b) > 2 * max_text_length:
            t = b[: 2 * max_text_length].decode("utf-16-le", "surrogatepass")
    # collapse runs of ' ' keeping the first — only literal spaces, like the
    # reference's `c != ' ' || pre != ' '` test
    return re.sub("  +", " ", t)


def purge_latin_if_minor(text: str) -> str:
    """Drop [A-z] chars when 2*latin < non-latin (Detector._cleaningText).

    latin:    'A' <= c <= 'z'   (includes [ \\ ] ^ _ ` — faithful)
    nonlatin: c >= U+0300 and c not in Latin Extended Additional
    (counts are over UTF-16 units, like the reference's char loop)
    """
    cp = str_to_utf16_units(text)
    if cp.size == 0:
        return text
    latin = (cp >= 0x41) & (cp <= 0x7A)
    nonlatin = (cp >= 0x0300) & ~((cp >= _LATIN_EXT_ADD[0]) & (cp <= _LATIN_EXT_ADD[1]))
    if 2 * int(latin.sum()) < int(nonlatin.sum()):
        return units_to_str(cp[~latin])
    return text
