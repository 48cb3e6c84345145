"""Language detection — the reference's random-feature-sampling naive-Bayes
detector, in two forms with the same semantics:

* :class:`Detector` — faithful per-document implementation mirroring the
  reference API and draw sequence (Detector.java:214-227 append,
  :233-261 _cleaningText, :301-335 _detectBlock, :343-357 _initProbability,
  :364-379 _extractNGrams, :387-402 _updateLangProb, :423-436 _normalizeProb,
  :443-462 _sortProbability).  Uses the ``java.util.Random`` replica, so a
  seeded run follows the reference's exact sampling order
  (DetectorFactory.setSeed, DetectorFactory.java:210-213).

* :func:`detect_batch` — the vectorized scale path.  Identical math: per
  trial t, alpha_t = alpha + N(0,1)*0.05; iterate
  prob *= alpha_t/10000 + P(gram_r|lang); every 5th iteration renormalize
  and stop when max > 0.99999 (or at the 1000-iteration cap); average the
  per-trial posteriors.  Draws come from a per-document counter-based
  Philox stream (deterministic given the document's seed); the inner loop
  is chunked cumprod over a (trials, chunk, langs) tensor — see
  ``_detect_one`` for why linear space is numerically safe.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import (
    ALPHA_DEFAULT,
    ALPHA_WIDTH,
    BASE_FREQ,
    CONV_THRESHOLD,
    ITERATION_LIMIT,
    MAX_TEXT_LENGTH,
    N_TRIAL_DEFAULT,
    PROB_THRESHOLD,
    UNKNOWN_LANG,
)
from ..functions.javarandom import JavaRandom
from ..functions.ngram import (
    extract_gram_keys,
    extract_gram_keys_batch,
    extract_ngrams_scanner,
    pack_gram,
)
from ..functions.normalize import prepare_text, purge_latin_if_minor
from ..models.factory import DetectorModel

# Checkpoint groups per numpy block.  Each group = 5 sampling iterations
# (the renormalize-and-check cadence, Detector.java:322).  Group products
# are computed in float32 — safe because (alpha/BASE_FREQ)^5 ≈ 2.4e-23 is
# far above the float32 minimum — then the cross-group cumprod runs in
# float64 ((2.4e-23)^10 ≈ 1e-226 > fp64 min).  This keeps the per-chunk
# memory traffic ~4× below an all-fp64 formulation, which matters because
# 32 parallel UDF workers saturate memory bandwidth before CPU.
_CHUNK_GROUPS = 10
_GROUP = 5
_MAX_GROUPS = ITERATION_LIMIT // _GROUP + 1  # 201 → ≤1005 draws/trial


class CantDetectError(ValueError):
    """No usable features in text (ELangDetectErrorCode.CantDetectError)."""


class Detector:
    """Faithful per-document detector (reference API shape)."""

    def __init__(self, model: DetectorModel, seed: int | None = None) -> None:
        self.model = model
        self.seed = seed
        self.text = ""
        self.alpha = ALPHA_DEFAULT
        self.n_trial = N_TRIAL_DEFAULT
        self.max_text_length = MAX_TEXT_LENGTH
        self.prior: np.ndarray | None = None
        self._lang_prob: np.ndarray | None = None

    def set_alpha(self, alpha: float) -> None:
        self.alpha = alpha

    def set_trials(self, n: int) -> None:
        self.n_trial = n

    def set_max_text_length(self, n: int) -> None:
        self.max_text_length = n

    def set_prior_map(self, prior: dict[str, float]) -> None:
        p = np.zeros(len(self.model.langs))
        for i, lang in enumerate(self.model.langs):
            v = prior.get(lang)
            if v is not None:
                if v < 0:
                    raise ValueError("Prior probability must be non-negative.")
                p[i] = v
        if p.sum() <= 0:
            raise ValueError("More one of prior probability must be non-zero.")
        self.prior = p / p.sum()

    def append(self, text: str) -> None:
        self.text += prepare_text(text, self.max_text_length)

    def detect(self) -> str:
        probs = self.get_probabilities()
        return probs[0][0] if probs else UNKNOWN_LANG

    def get_probabilities(self) -> list[tuple[str, float]]:
        if self._lang_prob is None:
            self._lang_prob = self._detect_block()
        return sort_probability(self.model.langs, self._lang_prob)

    def _detect_block(self) -> np.ndarray:
        text = purge_latin_if_minor(self.text)
        grams = extract_ngrams_scanner(text)
        rows = [r for r in (self._row(g) for g in grams) if r >= 0]
        if not rows:
            raise CantDetectError("no features in text")
        n_langs = len(self.model.langs)
        lang_prob = np.zeros(n_langs)
        rng = JavaRandom(self.seed)
        for _ in range(self.n_trial):
            prob = (
                self.prior.copy()
                if self.prior is not None
                else np.full(n_langs, 1.0 / n_langs)
            )
            alpha = self.alpha + rng.next_gaussian() * ALPHA_WIDTH
            weight = alpha / BASE_FREQ
            i = 0
            while True:
                r = rows[rng.next_int(len(rows))]
                prob *= weight + self.model.probs[r]
                if i % 5 == 0:
                    s = prob.sum()
                    prob /= s
                    if prob.max() > CONV_THRESHOLD or i >= ITERATION_LIMIT:
                        break
                i += 1
            lang_prob += prob / self.n_trial
        return lang_prob

    def _row(self, gram: str) -> int:
        k = np.array([pack_gram(gram)], dtype=np.int64)
        return int(self.model.lookup_rows(k)[0])


def sort_probability(langs, prob: np.ndarray) -> list[tuple[str, float]]:
    """Threshold at PROB_THRESHOLD, sort descending, stable on ties
    (Detector._sortProbability)."""
    order = np.argsort(-prob, kind="stable")
    return [
        (langs[int(j)], float(prob[j])) for j in order if prob[j] > PROB_THRESHOLD
    ]


# ---------------------------------------------------------------------------
# Vectorized batch path
# ---------------------------------------------------------------------------


def _detect_one(
    model: DetectorModel,
    prepared_text: str,
    rng: np.random.Generator,
    alpha: float,
    n_trial: int,
    prior: np.ndarray | None,
) -> np.ndarray | None:
    """All ``n_trial`` trials run in lockstep; draws are consumed in groups
    of 5 (the renormalize-and-check cadence) so convergence is evaluated at
    every group boundary, matching the reference's every-5-iterations check
    (the vectorized path checks after 5,10,… updates; the faithful path
    after 1,6,11,… — a scheduling detail with no semantic effect, and the
    two paths agree on labels, see tests/test_parity_f1.py).
    """
    text = purge_latin_if_minor(prepared_text)
    keys = extract_gram_keys(text)
    return _detect_from_keys(model, keys, rng, alpha, n_trial, prior)


def _detect_from_keys(
    model: DetectorModel,
    keys: np.ndarray,
    rng: np.random.Generator,
    alpha: float,
    n_trial: int,
    prior: np.ndarray | None,
) -> np.ndarray | None:
    if keys.size == 0:
        return None
    rows = model.lookup_rows(keys)
    rows = rows[rows >= 0]
    if rows.size == 0:
        return None
    ur, inv = np.unique(rows, return_inverse=True)
    n_langs = model.probs.shape[1]
    base = prior if prior is not None else np.full(n_langs, 1.0 / n_langs)
    weights = (
        (alpha + rng.standard_normal(n_trial) * ALPHA_WIDTH) / BASE_FREQ
    ).astype(np.float32)
    # single float32 gather table; the per-trial weight is added into the
    # gathered chunk tensor in place.  Deliberately NO (T, u, L) per-trial
    # table: that allocation (~300 KB/doc) crosses glibc's mmap threshold
    # and the resulting per-document mmap/munmap churn serializes on kernel
    # TLB shootdowns once tens of workers run in parallel.
    Pu = model.probs[ur].astype(np.float32)  # (u, L)
    m = rows.size
    prob = np.tile(base, (n_trial, 1))  # (T, L) float64
    done = np.zeros(n_trial, dtype=bool)
    result = np.zeros((n_trial, n_langs))
    g_done = 0
    while True:
        g = min(_CHUNK_GROUPS, _MAX_GROUPS - g_done)
        # the draw TENSOR keeps its full (T, g, 5) shape even after trials
        # converge — RNG consumption must not depend on convergence, or
        # per-doc outputs would change; compute is then masked to the
        # still-active trials (values for those are bit-identical to the
        # unmasked form: same draws, same weights, same prob rows)
        draws = inv[rng.integers(0, m, size=(n_trial, g, _GROUP))]
        act = np.flatnonzero(~done)
        pf = Pu[draws[act]]  # (A, g, 5, L) float32 gather
        pf += weights[act, None, None, None]
        gf = pf.prod(axis=2)   # (A, g, L) float32 — safe range, see above
        cg = np.cumprod(gf, axis=1, dtype=np.float64)  # (A, g, L)
        ck = prob[act, None, :] * cg
        ck /= ck.sum(axis=2, keepdims=True)
        maxp = ck.max(axis=2)  # (A, g)
        at_cap = g_done + g >= _MAX_GROUPS
        hits = maxp > CONV_THRESHOLD
        if at_cap:
            hits[:, -1] = True
        # batched first-hit selection (argmax finds the first True)
        first = hits.argmax(axis=1)                    # (A,)
        has = hits[np.arange(act.size), first]
        sel = np.flatnonzero(has)
        if sel.size:
            tsel = act[sel]
            result[tsel] = ck[sel, first[sel]]
            done[tsel] = True
        rest = np.flatnonzero(~has)
        if rest.size == 0:
            break
        prob[act[rest]] = ck[rest, -1, :]
        g_done += g
    return result.mean(axis=0)


# sub-batch packing for the batched sampling call: enough docs to amortize
# numpy dispatch, but capped by TOTAL gram keys so the concatenated gather
# table stays cache-resident (long documents have thousands of unique
# grams each — 128 of them would build a 100+ MB table and turn the
# per-chunk gathers DRAM-bound).  Batch composition never affects values:
# every document keeps its own RNG stream and per-pair reductions.
_SUBBATCH = int(os.environ.get("LANGDETECT_SUBBATCH", "128"))
_SUBBATCH_KEYS = int(os.environ.get("LANGDETECT_SUBBATCH_KEYS", "64000"))
# chunks of draws fetched per integers() call on multi-chunk documents
# (prefix property makes slices bitwise-equal to separate calls)
_PREFETCH_CHUNKS = int(os.environ.get("LANGDETECT_PREFETCH_CHUNKS", "3"))


def _pack_subbatches(keys_list):
    """Contiguous (lo, hi) ranges: ≤ _SUBBATCH docs and ≤ _SUBBATCH_KEYS
    total keys per range (single oversized docs get their own range)."""
    ranges = []
    lo, total = 0, 0
    for i, k in enumerate(keys_list):
        n = k.size
        if i > lo and (i - lo >= _SUBBATCH or total + n > _SUBBATCH_KEYS):
            ranges.append((lo, i))
            lo, total = i, 0
        total += n
    ranges.append((lo, len(keys_list)))
    return ranges


def _detect_many_from_keys(
    model: DetectorModel,
    keys_list: list[np.ndarray],
    rngs: list,
    alpha: float,
    n_trial: int,
    prior: np.ndarray | None,
) -> list[np.ndarray | None]:
    """Batched twin of _detect_from_keys: the chunk loop's gather / prod /
    cumprod / normalize run ONCE per chunk for every still-active
    (document, trial) pair across the whole sub-batch, amortizing numpy
    dispatch that dominates per-document cost on short texts.

    Bitwise-identical to the scalar path: each document draws from its OWN
    generator in the same order and shapes (weights first, then full
    (T, g, 5) integer tensors per chunk regardless of trial convergence),
    and every floating-point reduction runs per (doc, trial) pair over the
    same operands in the same order — batching only changes which python
    call issues them."""
    n_docs = len(keys_list)
    n_langs = model.probs.shape[1]
    out: list[np.ndarray | None] = [None] * n_docs
    base = prior if prior is not None else np.full(n_langs, 1.0 / n_langs)
    # batched prep: ONE searchsorted over the concatenated keys and ONE
    # unique over doc-offset row ids replace the per-doc lookup/unique loop
    # (which dominates prep cost on short documents).  Offsetting rows by
    # doc*n_rows makes the global sorted-unique identical to concatenating
    # the per-doc uniques in doc order — same pu_cat, same inv values.
    sizes = np.fromiter((k.size for k in keys_list), dtype=np.int64,
                        count=n_docs)
    n_rows_model = model.probs.shape[0]
    if sizes.sum():
        rows_cat = model.lookup_rows(np.concatenate(keys_list))
    else:
        rows_cat = np.empty(0, dtype=np.int64)
    doc_cat = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
    valid = rows_cat >= 0
    vdoc = doc_cat[valid]
    vvals = vdoc * n_rows_model + rows_cat[valid]
    gu, ginv = np.unique(vvals, return_inverse=True)
    pu_cat = model.probs[gu % n_rows_model].astype(np.float32)
    ms_all = np.bincount(vdoc, minlength=n_docs)  # valid rows per doc
    seg_hi = np.cumsum(ms_all)
    seg_lo = seg_hi - ms_all
    docids: list[int] = []
    invs: list[np.ndarray] = []
    ms: list[int] = []
    weights_l: list[np.ndarray] = []
    for d in range(n_docs):
        if ms_all[d] == 0:
            continue
        # weight draw order per admitted doc is unchanged (doc-ascending)
        w = (
            (alpha + rngs[d].standard_normal(n_trial) * ALPHA_WIDTH) / BASE_FREQ
        ).astype(np.float32)
        docids.append(d)
        invs.append(ginv[seg_lo[d] : seg_hi[d]])
        ms.append(int(ms_all[d]))
        weights_l.append(w)
    if not docids:
        return out
    n_adm = len(docids)
    W = np.stack(weights_l)  # (n_adm, T)
    prob = np.tile(base, (n_adm, n_trial, 1))  # (n_adm, T, L) float64
    done = np.zeros((n_adm, n_trial), dtype=bool)
    result = np.zeros((n_adm, n_trial, n_langs))
    alive = np.arange(n_adm)
    seg_lo_adm = seg_lo[np.asarray(docids, dtype=np.int64)]
    # per-doc draw prefetch: one integers() call yields (k, T, g, 5) —
    # C-order fills chunk-major, so slice [i] is BITWISE the i-th separate
    # (T, g, 5) call on the same stream (prefix property; draws a converged
    # doc never uses are discarded, which cannot affect outputs).  Cuts the
    # per-(doc, chunk) python-call overhead ~k× on multi-chunk docs.
    cache: list[np.ndarray | None] = [None] * n_adm
    cache_pos = [0] * n_adm
    g_done = 0
    while alive.size:
        g = min(_CHUNK_GROUPS, _MAX_GROUPS - g_done)
        draw_raw = np.empty((alive.size, n_trial, g, _GROUP), dtype=np.int64)
        full = g == _CHUNK_GROUPS
        for j, a in enumerate(alive):
            c = cache[a]
            if full and c is not None and cache_pos[a] < c.shape[0]:
                draw_raw[j] = c[cache_pos[a]]
                cache_pos[a] += 1
                continue
            if full and _PREFETCH_CHUNKS > 1 and (
                g_done + _PREFETCH_CHUNKS * g <= _MAX_GROUPS - 1
            ):
                c = rngs[docids[a]].integers(
                    0, ms[a],
                    size=(_PREFETCH_CHUNKS, n_trial, g, _GROUP),
                )
                cache[a] = c
                cache_pos[a] = 1
                draw_raw[j] = c[0]
            else:
                draw_raw[j] = rngs[docids[a]].integers(
                    0, ms[a], size=(n_trial, g, _GROUP)
                )
        # one global gather maps every doc's local row draws through its
        # ginv segment (replaces a per-doc fancy-index in the loop above)
        draw_rows = ginv[draw_raw + seg_lo_adm[alive, None, None, None]]
        act_doc, act_tr = np.nonzero(~done[alive])  # active pairs (local)
        at_cap = g_done + g >= _MAX_GROUPS
        # Per-group sequential evaluation with convergence early-exit.
        # The draw tensor above is already full-size (RNG geometry must not
        # depend on convergence), but the float work below runs group by
        # group and drops each (doc, trial) pair the moment it converges —
        # the median pair converges at ~13 groups, so the all-groups-then-
        # pick-first formulation computed ~10-group chunks it never used
        # (~30-40% of the gather/product flops on this corpus profile).
        # Bitwise-identical to that formulation: gf_j is elementwise per
        # (pair, group); the running float64 product multiplies in
        # np.cumprod's exact order (c_j = c_{j-1} * f64(gf_j)); and
        # ck_j = prob * c_j is normalized per group exactly as before.
        pairs_doc = act_doc
        pairs_tr = act_tr
        P0 = prob[alive[pairs_doc], pairs_tr]        # (P, L) float64
        Wp = W[alive[pairs_doc], pairs_tr]           # (P,) float32
        run: np.ndarray | None = None
        for j in range(g):
            pf = pu_cat[draw_rows[pairs_doc, pairs_tr, j]]  # (P, 5, L) f32
            pf += Wp[:, None, None]
            gf = pf.prod(axis=1)                     # (P, L) f32
            run = gf.astype(np.float64) if run is None else run * gf
            ck = P0 * run
            ck /= ck.sum(axis=1, keepdims=True)
            hits = ck.max(axis=1) > CONV_THRESHOLD
            if at_cap and j == g - 1:
                hits[:] = True
            conv = np.flatnonzero(hits)
            if conv.size:
                gd = alive[pairs_doc[conv]]
                result[gd, pairs_tr[conv]] = ck[conv]
                done[gd, pairs_tr[conv]] = True
            if j == g - 1:
                live = np.flatnonzero(~hits)
                if live.size:
                    prob[alive[pairs_doc[live]], pairs_tr[live]] = ck[live]
                break
            if conv.size:
                live = np.flatnonzero(~hits)
                if live.size == 0:
                    break
                pairs_doc = pairs_doc[live]
                pairs_tr = pairs_tr[live]
                P0 = P0[live]
                Wp = Wp[live]
                run = run[live]
        alive = alive[~done[alive].all(axis=1)]
        g_done += g
    for a, d in enumerate(docids):
        out[d] = result[a].mean(axis=0)
    return out


def _batch_keys(texts, max_text_length: int) -> list:
    """Prepared-text gram keys for a batch: normalization/purge per doc
    (string ops), then ONE vectorized extraction pass across all docs
    (extract_gram_keys_batch — bit-identical per-doc output).

    Both stages are memoized per DISTINCT text within the batch: key
    extraction is a pure per-doc function, so exact-duplicate documents
    (boilerplate, re-crawls — and the replicated bench corpus) share one
    normalization + extraction.  Values are identical by construction;
    only the per-doc RNG/seed state downstream distinguishes copies."""
    norm_cache: dict = {}
    uniq: dict[str, int] = {}
    order: list[str] = []
    idx: list[int] = []
    for text in texts:
        p = norm_cache.get(text)
        if p is None:
            p = (
                "" if text is None
                else purge_latin_if_minor(prepare_text(text, max_text_length))
            )
            norm_cache[text] = p
        j = uniq.get(p)
        if j is None:
            j = len(order)
            uniq[p] = j
            order.append(p)
        idx.append(j)
    uk = extract_gram_keys_batch(order)
    # shared read-only ndarrays: every consumer (lookup, concatenate,
    # perplexity) only reads the key arrays
    return [uk[j] for j in idx]


def doc_seed(doc_key: str, salt: int = 0) -> int:
    """Stable per-document RNG seed from a document key (e.g. url)."""
    import zlib

    return (zlib.crc32(doc_key.encode("utf-8")) ^ salt) & 0xFFFFFFFF


def annotate_batch(
    model: DetectorModel,
    texts,
    seeds,
    alpha: float = ALPHA_DEFAULT,
    n_trial: int = N_TRIAL_DEFAULT,
    max_text_length: int = MAX_TEXT_LENGTH,
    lm_alpha: float = 0.1,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Fused per-document annotate: langid + confidence + char-trigram
    perplexity from ONE gram extraction (the LM reuses the detector's
    post-purge gram keys; both stages share prepare_text).
    Returns (langs, confs, ppl) with ppl = nan where undefined."""
    from .perplexity import perplexity_many_from_keys

    lang_conf = np.zeros(len(texts))
    out_langs: list[str] = []
    keys_list = _batch_keys(texts, max_text_length)
    rngs = [np.random.Generator(np.random.Philox(key=int(s))) for s in seeds]
    results: list[np.ndarray | None] = []
    for lo, hi in _pack_subbatches(keys_list):
        results.extend(
            _detect_many_from_keys(
                model, keys_list[lo:hi], rngs[lo:hi], alpha, n_trial, None
            )
        )
    # LM scoring batched across the whole batch (one lookup pair instead
    # of one per doc — bit-identical, see perplexity_many_from_keys);
    # lang_idx = -1 marks docs the detector rejected (no ppl, as before)
    lang_idx = np.full(len(texts), -1)
    for i, p in enumerate(results):
        if p is None:
            out_langs.append(UNKNOWN_LANG)
            continue
        top = int(np.argmax(p))
        if p[top] > PROB_THRESHOLD:
            out_langs.append(model.langs[top])
            lang_conf[i] = p[top]
            lang_idx[i] = top
        else:
            out_langs.append(UNKNOWN_LANG)
    ppl = perplexity_many_from_keys(model, keys_list, lang_idx, lm_alpha)
    return out_langs, lang_conf, ppl


def detect_batch(
    model: DetectorModel,
    texts,
    seeds,
    alpha: float = ALPHA_DEFAULT,
    n_trial: int = N_TRIAL_DEFAULT,
    max_text_length: int = MAX_TEXT_LENGTH,
    prior: np.ndarray | None = None,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Detect a batch of raw texts.

    Returns (langs, confs, posteriors) where ``langs[i]`` is the top-1
    language ("unknown" when the text has no known features),
    ``confs[i]`` its posterior probability, and ``posteriors`` the full
    (n_docs, n_langs) averaged posterior matrix.
    """
    n_langs = len(model.langs)
    out_langs: list[str] = []
    confs = np.zeros(len(texts))
    post = np.zeros((len(texts), n_langs))
    keys_list = _batch_keys(texts, max_text_length)
    rngs = [np.random.Generator(np.random.Philox(key=int(s))) for s in seeds]
    results: list[np.ndarray | None] = []
    for lo, hi in _pack_subbatches(keys_list):
        results.extend(
            _detect_many_from_keys(
                model, keys_list[lo:hi], rngs[lo:hi], alpha, n_trial, prior
            )
        )
    for i, p in enumerate(results):
        if p is None:
            out_langs.append(UNKNOWN_LANG)
            continue
        post[i] = p
        top = int(np.argmax(p))
        if p[top] > PROB_THRESHOLD:
            out_langs.append(model.langs[top])
            confs[i] = p[top]
        else:
            out_langs.append(UNKNOWN_LANG)
    return out_langs, confs, post
