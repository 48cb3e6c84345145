"""Language profile: gram→count map + per-length totals, with the reference's
JSON on-disk format (byte-compatible loader, so profiles produced by the
reference engine load unchanged).

Semantics source: /root/reference/.../util/LangProfile.java
  * fields + addNGram: LangProfile.java:31-33, 82-92
  * merge:             LangProfile.java:100-118
  * omitLessFreq:      LangProfile.java:123-163 (trim then roman purge,
                       n_words mutated in trim order)
  * update:            LangProfile.java:172-189
  * JSON codec:        LangProfile.java:192-211  ({"freq":…,"n_words":[3],
                       "name":…})
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from ..config import LESS_FREQ_RATIO, MINIMUM_FREQ, N_GRAM
from ..functions.ngram import NGramScanner
from ..functions.normalize import normalize_vi

_ROMAN_ONE = re.compile(r"^[A-Za-z]$")
_HAS_ROMAN = re.compile(r".*[A-Za-z].*", re.DOTALL)


def _canon(gram: str) -> str:
    """Canonical string form: adjacent surrogate halves join into the astral
    char (the form JSON round-trips to; same UTF-16 unit sequence either
    way, which is what Java compares)."""
    return gram.encode("utf-16-le", "surrogatepass").decode(
        "utf-16-le", "surrogatepass"
    )


def _ulen(gram: str) -> int:
    """Gram length in UTF-16 code units — Java's String.length(), which is
    what indexes n_words (LangProfile.java:90)."""
    return len(gram.encode("utf-16-le", "surrogatepass")) // 2


class LangProfile:
    def __init__(self, name: str) -> None:
        if not name:
            raise ValueError("Name must be non-empty")
        self.name = name
        self.freq: dict[str, int] = {}
        self.n_words = [0] * N_GRAM

    def add_ngram(self, gram: str) -> None:
        if not gram:
            raise ValueError("Gram must be non-empty")
        n = _ulen(gram)
        if n > N_GRAM:
            raise ValueError(f"Maximum gram length is {N_GRAM}")
        gram = _canon(gram)
        self.n_words[n - 1] += 1
        self.freq[gram] = self.freq.get(gram, 0) + 1

    def merge(self, other: "LangProfile") -> None:
        if self.name != other.name:
            raise ValueError(f"Cannot merge {self.name} with {other.name}")
        for i in range(N_GRAM):
            self.n_words[i] += other.n_words[i]
        for k, v in other.freq.items():
            self.freq[k] = self.freq.get(k, 0) + v

    def omit_less_freq(self) -> None:
        threshold = max(self.n_words[0] // LESS_FREQ_RATIO, MINIMUM_FREQ)
        roman = 0
        for gram, count in list(self.freq.items()):
            if count <= threshold:
                self.n_words[_ulen(gram) - 1] -= count
                del self.freq[gram]
            elif _ROMAN_ONE.match(gram):
                roman += count
        if roman < self.n_words[0] // 3:
            for gram, count in list(self.freq.items()):
                if _HAS_ROMAN.match(gram):
                    self.n_words[_ulen(gram) - 1] -= count
                    del self.freq[gram]

    def update(self, text: str | None) -> None:
        if text is None:
            return
        t = normalize_vi(text)
        sc = NGramScanner()
        for ch in t:
            cp = ord(ch)
            if cp < 0x10000:
                units = (ch,)
            else:
                v = cp - 0x10000
                units = (chr(0xD800 + (v >> 10)), chr(0xDC00 + (v & 0x3FF)))
            for unit in units:
                sc.add_char(unit)
                for n in range(1, N_GRAM + 1):
                    g = sc.get(n)
                    if g is not None:
                        self.add_ngram(g)

    # --- JSON codec (reference format) ---------------------------------
    @classmethod
    def from_json_dict(cls, d: dict) -> "LangProfile":
        p = cls(d["name"])
        p.n_words = [int(x) for x in d["n_words"]]
        p.freq = {k: int(v) for k, v in d["freq"].items()}
        return p

    @classmethod
    def from_json(cls, s: str) -> "LangProfile":
        return cls.from_json_dict(json.loads(s))

    @classmethod
    def load(cls, path: str | Path) -> "LangProfile":
        return cls.from_json_dict(
            json.loads(Path(path).read_text(encoding="utf-8"))
        )

    def to_json_dict(self) -> dict:
        return {"name": self.name, "n_words": list(self.n_words), "freq": dict(self.freq)}

    def to_json(self) -> str:
        return json.dumps(self.to_json_dict(), ensure_ascii=True, separators=(",", ":"))

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json(), encoding="utf-8")
