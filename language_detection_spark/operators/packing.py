"""Training-sequence packing: concat-and-chunk documents into fixed
token-length training windows (the GPT-style packing step that turns a
curated corpus into model-ready sequences).

Reference anchor: this sits downstream of the reference's keep/drop
pipeline (the per-document discipline of ``Detector.java:90`` caps and
normalizes one document at a time; packing is the corpus-level step the
reference leaves to its consumers).  The mechanism here follows the
publicly documented concat-and-chunk scheme (GPT-2/3, T5 "pack to
max_seq_len"): documents are concatenated in a deterministic order and
the token stream is cut every ``seq_len`` tokens, so a document can span
two or more sequences and a sequence usually carries several documents.

Scale design (100 TB): a single global concatenation order would funnel
the whole corpus through one ordered window.  Instead the corpus is
hash-sharded (``shard = md5(salt:doc_id) % n_shards``) and each shard is
an independent packing stream — exactly how production packers emit one
training file per shard.  The only shuffle is the repartition-by-shard
for the per-shard running sum; ``n_shards`` scales with the corpus (one
shard ≈ one output file), so shard size — and the per-task sort — stays
bounded.  Everything is JVM expressions: hash, window cumsum, integer
division, explode of the spanned-sequence range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_int
from .text_analysis import whitespace_token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack:v1",
) -> DataFrame:
    """Assign every document its slice positions in fixed-length packed
    training sequences.

    Semantics (per shard, docs ordered by ``id_col``):

    * ``tok_start``/``tok_end`` — the document's half-open span in the
      shard's concatenated token stream (whitespace tokens).
    * The document appears in every sequence its span overlaps:
      ``seq_id ∈ [tok_start div L, (tok_end - 1) div L]``.
    * One output row per (document, sequence) overlap with the slice
      geometry: ``seq_start``/``seq_end`` — the half-open position range
      the document's tokens occupy inside sequence ``seq_id`` — and
      ``doc_offset`` — the index of the first of those tokens within the
      document.

    ``groupBy(shard, seq_id)`` on the output reconstructs each training
    sequence's composition; the final partial sequence of each shard is
    emitted like any other (trainers pad or drop it).  Zero-token
    documents carry no tokens and are excluded.

    Determinism: shard assignment is a pure hash of (salt, id) and the
    intra-shard order is by id, so the packing is stable across runs,
    partitionings, and cluster sizes, and independently re-derivable —
    the contract oracle re-computes it end-to-end in DuckDB.

    Integer discipline: sequence ids use ``DIV`` (exact integer
    division), never float ``floor(a/b)`` — at 10^12-token shards a
    double mantissa would silently mis-bin spans.
    """
    if seq_len < 1 or n_shards < 1:
        raise ValueError("seq_len and n_shards must be >= 1")
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            whitespace_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
            F.pmod(
                md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                F.lit(n_shards),
            ).cast("int").alias("shard"),
        )
        .filter(F.col("n_tokens") >= 1)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = base.select(
        "shard",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start"),
        F.sum("n_tokens").over(w).alias("tok_end"),
    )
    L = F.lit(int(seq_len))
    exploded = spans.select(
        "shard",
        "doc_id",
        "n_tokens",
        "tok_start",
        "tok_end",
        F.explode(
            F.sequence(
                F.expr(f"tok_start DIV {int(seq_len)}"),
                F.expr(f"(tok_end - 1) DIV {int(seq_len)}"),
            )
        ).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    return exploded.select(
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        F.greatest(F.col("tok_start") - seq_lo, F.lit(0))
        .cast("int").alias("seq_start"),
        F.least(F.col("tok_end") - seq_lo, L.cast("bigint"))
        .cast("int").alias("seq_end"),
        F.greatest(seq_lo - F.col("tok_start"), F.lit(0))
        .cast("bigint").alias("doc_offset"),
        "n_tokens",
    )


_FFD_SCHEMA = (
    "shard int, bin_id bigint, doc_id bigint, n_tokens bigint, "
    "oversize boolean"
)


def pack_documents(
    df: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "packffd:v1",
) -> DataFrame:
    """No-split bin packing: each document lands WHOLE in exactly one bin
    of capacity ``seq_len`` tokens — the packing used when documents must
    not be cut (SFT / instruction tuning), complementing the
    concat-and-chunk ``pack_sequences``.

    Per shard (same ``md5(salt:id) % n_shards`` sharding), docs are
    packed first-fit-decreasing — visit docs by (n_tokens desc, id asc),
    place each in the lowest-numbered bin with room, else open a new bin
    (FFD fills ≥ 8/9 of optimal, the classical bound).  Docs longer than
    ``seq_len`` get a singleton bin flagged ``oversize`` (callers
    truncate or reroute them).  Zero-token docs are excluded.

    The greedy is inherently sequential PER SHARD, so it runs as one
    ``applyInPandas`` per shard group — the custom-operator escape hatch
    for semantics DataFrame expressions can't state.  Shard size is
    bounded by ``n_shards`` scaling with the corpus (one shard ≈ one
    output file), so the per-group state stays small; everything
    upstream (token counts, shard hash) is JVM expressions and the only
    shuffle is the groupBy(shard).

    Deterministic: pure function of (salt, ids, texts) — the contract
    oracle re-derives it with an independent plain-Python FFD.
    """
    if seq_len < 1 or n_shards < 1:
        raise ValueError("seq_len and n_shards must be >= 1")
    base = (
        df.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            whitespace_token_count(F.col(text_col)).cast("bigint")
            .alias("n_tokens"),
            F.pmod(
                md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                F.lit(n_shards),
            ).cast("int").alias("shard"),
        )
        .filter(F.col("n_tokens") >= 1)
    )

    cap = int(seq_len)

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        fills: list[int] = []
        bin_ids, oversize = [], []
        for nt in pdf["n_tokens"].to_numpy():
            nt = int(nt)
            if nt > cap:
                bin_ids.append(len(fills))
                fills.append(nt)
                oversize.append(True)
                continue
            for b, fill in enumerate(fills):
                if fill + nt <= cap:
                    fills[b] = fill + nt
                    bin_ids.append(b)
                    break
            else:
                bin_ids.append(len(fills))
                fills.append(nt)
            if len(bin_ids) > len(oversize):
                oversize.append(False)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bin_ids,
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "oversize": oversize,
            }
        )

    return base.groupBy("shard").applyInPandas(_pack, _FFD_SCHEMA)


def pack_documents_local(rows, seq_len=256, n_shards=8, salt="packffd:v1"):
    """Independent plain-Python re-derivation of the same FFD spec (used
    to bake the contract oracle and as the differential-test arbiter).
    ``rows`` = iterable of (doc_id, text)."""
    import hashlib

    def shard_of(doc_id):
        h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % n_shards

    def ntok(t):
        t = t.strip()
        return len(t.split()) if t else 0

    docs = [
        (shard_of(i), i, ntok(t)) for i, t in rows if ntok(t) >= 1
    ]
    out = []
    for shard in sorted({s for s, _, _ in docs}):
        members = sorted(
            [(i, n) for s, i, n in docs if s == shard],
            key=lambda x: (-x[1], x[0]),
        )
        fills: list[int] = []
        for doc_id, nt in members:
            if nt > seq_len:
                out.append((shard, len(fills), doc_id, nt, True))
                fills.append(nt)
                continue
            for b, fill in enumerate(fills):
                if fill + nt <= seq_len:
                    fills[b] = fill + nt
                    out.append((shard, b, doc_id, nt, False))
                    break
            else:
                out.append((shard, len(fills), doc_id, nt, False))
                fills.append(nt)
    return out
