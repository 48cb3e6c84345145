"""Audio energy-envelope fingerprint dedup: spec invariances, vectorized-
vs-scalar parity, banded-join exactness vs brute force."""

import numpy as np
import pytest

from language_detection_spark.operators.multimodal import (
    audio_fingerprint,
    audio_fingerprint_samples,
    audio_near_dup_pairs,
    synth_dup_audio_df,
    synth_dup_audio_samples,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def truth():
    return {
        i: audio_fingerprint_samples(s)
        for i, s, _r in synth_dup_audio_samples(120)
    }


def test_fingerprint_vectorized_matches_scalar_reference():
    from language_detection_spark.queries import _afp_scalar

    for i, s, _r in synth_dup_audio_samples(24):
        assert audio_fingerprint_samples(s) == _afp_scalar(s), f"clip {i}"


def test_fingerprint_polarity_invariant():
    """|x| makes the fingerprint invariant to waveform polarity flip."""
    rng = np.random.Generator(np.random.Philox(key=11))
    s = rng.integers(-20000, 20001, size=5000).astype(np.int16)
    flipped = np.negative(s, where=s > -32768, out=s.copy())
    assert audio_fingerprint_samples(flipped) == audio_fingerprint_samples(s)


def test_fingerprint_short_clip_raises():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint_samples(np.zeros(64, dtype=np.int16))


def test_fixture_dup_structure(truth):
    """Planted structure: header/rate churn is hash-identical, halved
    gain within 3 bits, sparse noise within 12; distinct clips far."""
    for g in range(30):
        b = 4 * g
        assert truth[b] == truth[b + 1], "rate-metadata churn"
        assert _ham(truth[b], truth[b + 2]) <= 3, "gain halved"
        assert _ham(truth[b], truth[b + 3]) <= 12, "sparse noise"
        assert _ham(truth[b], truth[(b + 4) % 120]) >= 16, "cross-group"


def test_audio_fingerprint_decode_path_matches_truth(spark, truth):  # noqa: F811
    df = synth_dup_audio_df(spark, n=48)
    got = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got == {i: truth[i] for i in range(48)}


def test_audio_near_dups_equal_brute_force(spark, truth):  # noqa: F811
    df = synth_dup_audio_df(spark, n=120)
    rows = audio_near_dup_pairs(df, max_hamming=6, key_chunks=2).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    exact = {
        (a, b): _ham(truth[a], truth[b])
        for a in range(120)
        for b in range(a + 1, 120)
        if _ham(truth[a], truth[b]) <= 6
    }
    assert got == exact
    assert all(a // 4 == b // 4 for a, b in got)  # only planted groups pair
    assert len(got) >= 170


def test_fingerprint_property_vectorized_equals_scalar_random_clips():
    """Hypothesis fuzz: cumsum-vectorized fingerprint equals the
    nested-loop scalar spec on arbitrary lengths and contents, incl.
    int16 extremes (|−32768| stays exact in the int64 accumulator)."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from language_detection_spark.queries import _afp_scalar

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=65, max_value=9000),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, seed):
        rng = np.random.Generator(np.random.Philox(key=seed))
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        assert audio_fingerprint_samples(s) == _afp_scalar(s)

    check()
