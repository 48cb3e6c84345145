"""The reference's second detector with its REAL model: the langid.py port
(`com.carrotsearch.labs.langid.LangIdV3`, Lui & Baldwin ACL 2012).

Semantics source (cited for parity):
  * model fields + flattened [class][feature] layout: Model.java:23-83
  * byte-DFA feature walk: LangIdV3.java:171-193 (state =
    dsa[(state<<8) + (b & 0xff)]; emit dsaOutput[state] feature ids)
  * NB log-space scoring pdc = nb_pc + counts · nb_ptc: LangIdV3.java:259-284
  * argmax classify: LangIdV3.java:203-224
  * softmax confidence 1/Σexp(p_i − p_c): LangIdV3.java:244-254
  * language-subset projection: Model.java:110-142

The model is the reference's own ``langid.lzma``, decoded once by the
reference's compiled loader (tools/java_parity/langid) and re-serialized
as npz (data/langid_model.npz) — byte-identical arrays.

Execution shape: the DFA walk is sequential per byte but embarrassingly
parallel across documents, so the batch walker advances ALL documents one
byte-position per step (one vectorized gather per position over the
active docs).  Feature counting uses the classic ragged-gather (offsets +
repeat-arange), then per-doc bincount → one (F,) @ (F, C) matmul.
"""

from __future__ import annotations

import struct
from importlib import resources
from pathlib import Path

import numpy as np

UNKNOWN = "unknown"


class LangIdModel:
    def __init__(self, langs, ptc, pc, dsa, out_off, out_len, out_val) -> None:
        self.langs = list(langs)
        self.n_classes = len(self.langs)
        self.n_features = ptc.size // self.n_classes
        # nb_ptc is flattened [classIndex * numFeatures + featureIndex]
        # (naiveBayesClassConfidence walk, LangIdV3.java:272-283) →
        # reshape to (C, F) then transpose to (F, C) for doc-side matmul
        self.ptc_fc = np.ascontiguousarray(
            ptc.reshape(self.n_classes, self.n_features).T
        )
        self.pc = pc
        self.dsa = dsa  # int32[(n_states << 8)], already non-negative
        self.out_off = out_off
        self.out_len = out_len
        self.out_val = out_val

    # ------------------------------------------------------------------
    @classmethod
    def from_dump(cls, path: str | Path) -> "LangIdModel":
        """Parse the big-endian dump written by DumpLangidModel.java."""
        buf = Path(path).read_bytes()
        pos = 0

        def read_int() -> int:
            nonlocal pos
            v = struct.unpack_from(">i", buf, pos)[0]
            pos += 4
            return v

        n_langs = read_int()
        langs = []
        for _ in range(n_langs):
            ln = struct.unpack_from(">H", buf, pos)[0]
            pos += 2
            langs.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        n = read_int()
        ptc = np.frombuffer(buf, dtype=">f4", count=n, offset=pos).astype(np.float32)
        pos += 4 * n
        n = read_int()
        pc = np.frombuffer(buf, dtype=">f4", count=n, offset=pos).astype(np.float32)
        pos += 4 * n
        n = read_int()
        dsa = np.frombuffer(buf, dtype=">i2", count=n, offset=pos).astype(np.int32)
        pos += 2 * n
        n_states = read_int()
        out_off = np.zeros(n_states, dtype=np.int64)
        out_len = np.zeros(n_states, dtype=np.int32)
        vals: list[np.ndarray] = []
        total = 0
        for s in range(n_states):
            ln = read_int()
            if ln <= 0:
                continue
            out_off[s] = total
            out_len[s] = ln
            vals.append(
                np.frombuffer(buf, dtype=">i4", count=ln, offset=pos).astype(np.int32)
            )
            pos += 4 * ln
            total += ln
        out_val = np.concatenate(vals) if vals else np.empty(0, np.int32)
        return cls(langs, ptc, pc, dsa, out_off, out_len, out_val)

    @classmethod
    def load_npz(cls, path: str | Path | None = None) -> "LangIdModel":
        if path is None:
            src = resources.files("language_detection_spark.data").joinpath(
                "langid_model.npz"
            )
            with resources.as_file(src) as p:
                z = np.load(p, allow_pickle=False)
                return cls._from_npz(z)
        return cls._from_npz(np.load(path, allow_pickle=False))

    @classmethod
    def _from_npz(cls, z) -> "LangIdModel":
        langs = [s for s in z["langs"].tolist()]
        return cls(
            langs, z["ptc"], z["pc"], z["dsa"], z["out_off"], z["out_len"],
            z["out_val"],
        )

    def save_npz(self, path: str | Path) -> None:
        np.savez_compressed(
            path,
            langs=np.array(self.langs),
            ptc=np.ascontiguousarray(self.ptc_fc.T).ravel(),
            pc=self.pc,
            dsa=self.dsa,
            out_off=self.out_off,
            out_len=self.out_len,
            out_val=self.out_val,
        )

    # ------------------------------------------------------------------
    def subset(self, langs: list[str]) -> "LangIdModel":
        """detectOnly (Model.java:110-142): keep model language order."""
        keep = [l for l in self.langs if l in set(langs)]
        if len(keep) < 2:
            raise ValueError("A model must contain at least two languages.")
        idx = [self.langs.index(l) for l in keep]
        m = LangIdModel.__new__(LangIdModel)
        m.langs = keep
        m.n_classes = len(keep)
        m.n_features = self.n_features
        m.ptc_fc = np.ascontiguousarray(self.ptc_fc[:, idx])
        m.pc = self.pc[idx]
        m.dsa = self.dsa
        m.out_off = self.out_off
        m.out_len = self.out_len
        m.out_val = self.out_val
        return m


_DEFAULT_MODEL: LangIdModel | None = None


def default_model() -> LangIdModel:
    """Executor-side singleton of the bundled model (the npz decompress is
    ~100ms — once per worker process, never per Arrow batch)."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        _DEFAULT_MODEL = LangIdModel.load_npz()
    return _DEFAULT_MODEL


class LangIdV3:
    """Vectorized batch classifier over the real langid model."""

    def __init__(self, model: LangIdModel | None = None) -> None:
        self.model = model or default_model()

    def _feature_counts(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch DFA walk → (doc_ids, features) instance pairs."""
        m = self.model
        bs = [t.encode("utf-8") if t else b"" for t in texts]
        n = len(bs)
        maxlen = max((len(b) for b in bs), default=0)
        if maxlen == 0:
            return np.empty(0, np.int64), np.empty(0, np.int32), np.zeros(n, bool)
        B = np.zeros((n, maxlen), dtype=np.int32)
        mask = np.zeros((n, maxlen), dtype=bool)
        for i, b in enumerate(bs):
            if b:
                B[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
                mask[i, : len(b)] = True
        states = np.zeros(n, dtype=np.int32)
        S = np.zeros((n, maxlen), dtype=np.int32)
        for j in range(maxlen):
            alive = mask[:, j]
            states = np.where(
                alive, m.dsa[(states << 8) + B[:, j]], states
            )
            S[:, j] = states
        lens = np.where(mask, m.out_len[S], 0)  # (n, maxlen)
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int32), mask.any(axis=1)
        flat_lens = lens.ravel()
        nz = np.flatnonzero(flat_lens)
        ls = flat_lens[nz]
        starts = m.out_off[S.ravel()[nz]]
        # ragged arange gather
        rep = np.repeat(starts, ls)
        idx = rep + (np.arange(total) - np.repeat(np.cumsum(ls) - ls, ls))
        feats = m.out_val[idx]
        doc_ids = np.repeat(nz // maxlen, ls)
        return doc_ids, feats, mask.any(axis=1)

    def classify_batch(
        self, texts, unknown_on_featureless: bool = False
    ) -> tuple[list[str], np.ndarray]:
        """Top-1 language + normalized confidence per text.

        Default is reference-faithful: a document with no DFA features
        scores argmax of the class prior (the compiled Java returns e.g.
        ('en', 0.169) for such inputs — parity-tested).  With
        ``unknown_on_featureless=True`` those documents get UNKNOWN/0.0
        instead, matching the sampling engine's detect_batch semantics —
        the pipeline uses this so its two engines agree on empty/
        featureless documents."""
        m = self.model
        n = len(texts)
        doc_ids, feats, _has_bytes = self._feature_counts(list(texts))
        scores = np.tile(m.pc.astype(np.float32), (n, 1))  # (n, C)
        has_feats = np.zeros(n, dtype=bool)
        if doc_ids.size:
            order = np.argsort(doc_ids, kind="stable")
            doc_sorted = doc_ids[order]
            feat_sorted = feats[order]
            bounds = np.searchsorted(doc_sorted, np.arange(n + 1))
            for d in range(n):
                lo, hi = bounds[d], bounds[d + 1]
                if lo == hi:
                    continue
                has_feats[d] = True
                counts = np.bincount(feat_sorted[lo:hi], minlength=m.n_features)
                # float32 accumulation, like the reference's float math
                scores[d] += (
                    counts.astype(np.float32) @ m.ptc_fc
                )
        best = np.argmax(scores, axis=1)
        conf = np.empty(n)
        for d in range(n):
            conf[d] = 1.0 / np.exp(
                scores[d].astype(np.float64) - scores[d, best[d]]
            ).sum()
        if unknown_on_featureless:
            langs = [
                m.langs[int(b)] if has_feats[d] else UNKNOWN
                for d, b in enumerate(best)
            ]
            conf[~has_feats] = 0.0
        else:
            langs = [m.langs[int(b)] for b in best]
        return langs, conf

    def classify(self, text: str) -> tuple[str, float]:
        langs, conf = self.classify_batch([text])
        return langs[0], float(conf[0])

    def rank(self, text: str) -> list[tuple[str, float]]:
        """All languages with normalized confidences (LangIdV3.rank)."""
        m = self.model
        doc_ids, feats, _ = self._feature_counts([text])
        scores = m.pc.astype(np.float32).copy()
        if feats.size:
            counts = np.bincount(feats, minlength=m.n_features)
            scores = scores + counts.astype(np.float32) @ m.ptc_fc
        s64 = scores.astype(np.float64)
        confs = [float(1.0 / np.exp(s64 - s64[c]).sum()) for c in range(m.n_classes)]
        return list(zip(m.langs, confs))
