"""KenLM-style character-trigram perplexity scoring (Q2 in SURVEY.md §2.7).

Reuses the *same trained profile counts* as a backoff char-trigram LM —
the reference's profiles are char-trigram count tables (LangProfile.java:
31-33), so  P(c3 | c1 c2) = (count3 + a) / (count2 + a·V)  with add-a
smoothing over the model's gram vocabulary.  Vectorized with the packed
gram keys: a 3-gram key's low 34 bits are exactly its 2-char prefix key.
"""

from __future__ import annotations

import numpy as np

from ..functions.ngram import extract_gram_keys
from ..functions.normalize import prepare_text
from ..models.factory import DetectorModel

_PREFIX_MASK = (1 << 34) - 1
_THREE_GRAM_MIN = 1 << 34


def perplexity_from_keys(
    model: DetectorModel, keys: np.ndarray, lang_index: int, alpha: float = 0.1
) -> float | None:
    """LM over already-extracted packed gram keys (shared with detection)."""
    if model.counts is None:
        raise ValueError("model has no raw counts (needed for the LM)")
    k3 = keys[keys >= _THREE_GRAM_MIN]
    if k3.size == 0:
        return None
    V = float(model.keys.size)
    r3 = model.lookup_rows(k3)
    r2 = model.lookup_rows(k3 & _PREFIX_MASK)
    c3 = np.where(r3 >= 0, model.counts[np.maximum(r3, 0), lang_index], 0)
    c2 = np.where(r2 >= 0, model.counts[np.maximum(r2, 0), lang_index], 0)
    logp = np.log(c3 + alpha) - np.log(c2 + alpha * V)
    return float(np.exp(-logp.mean()))


def perplexity_one(
    model: DetectorModel, text: str, lang_index: int, alpha: float = 0.1
) -> float | None:
    return perplexity_from_keys(
        model, extract_gram_keys(prepare_text(text)), lang_index, alpha
    )


def perplexity_batch(
    model: DetectorModel,
    texts,
    lang_indices,
    alpha: float = 0.1,
) -> np.ndarray:
    out = np.full(len(texts), np.nan)
    for i, (t, li) in enumerate(zip(texts, lang_indices)):
        if t is None or li is None or li < 0:
            continue
        p = perplexity_one(model, t, int(li), alpha)
        if p is not None:
            out[i] = p
    return out
