"""Image perceptual-hash (dHash) dedup: spec invariances, vectorized-vs-
scalar hash parity, banded-join exactness vs brute force, plan shape."""

import numpy as np
import pytest

from language_detection_spark.operators.multimodal import (
    dhash_pixels,
    image_dhash,
    image_near_dup_pairs,
    synth_dup_image_pixels,
    synth_dup_images_df,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def truth():
    return {i: dhash_pixels(px) for i, px, _f in synth_dup_image_pixels(120)}


def test_dhash_brightness_invariant():
    """Constant brightness shift leaves every horizontal gradient — and so
    the hash — unchanged (integer-exact: avg(x + c) == avg(x) + c when no
    pixel clips)."""
    rng = np.random.Generator(np.random.Philox(key=7))
    px = rng.integers(40, 200, size=(33, 47, 3)).astype(np.uint8)
    for shift in (1, 12, 40):
        shifted = (px.astype(np.int16) + shift).astype(np.uint8)
        assert dhash_pixels(shifted) == dhash_pixels(px)


def test_dhash_vectorized_matches_scalar_reference():
    """The integral-image vectorized hash equals the nested-loop scalar
    spec implementation (queries._dhash_scalar) on every fixture image,
    including non-divisible grid boundaries (H,W not multiples of 8/9)."""
    from language_detection_spark.queries import _dhash_scalar

    for i, px, _f in synth_dup_image_pixels(24):
        assert dhash_pixels(px) == _dhash_scalar(px), f"image {i}"


def test_dhash_small_image_raises():
    with pytest.raises(ValueError, match="too small"):
        dhash_pixels(np.zeros((4, 4, 3), dtype=np.uint8))


def test_fixture_dup_structure(truth):
    """Planted structure: lossless re-encode and +12 brightness hash
    IDENTICALLY; sparse noise lands within Hamming 6; distinct pictures
    stay far (>= 16)."""
    for g in range(30):
        b = 4 * g
        assert truth[b] == truth[b + 1], "BMP vs PNG of same pixels"
        assert truth[b] == truth[b + 2], "brightness shift"
        assert _ham(truth[b], truth[b + 3]) <= 6, "sparse-noise variant"
        other = (b + 4) % 120
        assert _ham(truth[b], truth[other]) >= 16, "cross-group distance"


def test_image_dhash_decode_path_matches_truth(spark, truth):  # noqa: F811
    """encode → distributed decode → vectorized hash reproduces the
    hashes computed straight from the source pixels (lossless codecs)."""
    df = synth_dup_images_df(spark, n=48)
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got == {i: truth[i] for i in range(48)}


def test_image_near_dups_equal_brute_force(spark, truth):  # noqa: F811
    """Banded pairs (Manku 2-chunk keys over 64 bits) == exhaustive
    all-pairs answer — pigeonhole recall is exact, and the Hamming values
    agree."""
    df = synth_dup_images_df(spark, n=120)
    rows = image_near_dup_pairs(df, max_hamming=6, key_chunks=2).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    exact = {
        (a, b): _ham(truth[a], truth[b])
        for a in range(120)
        for b in range(a + 1, 120)
        if _ham(truth[a], truth[b]) <= 6
    }
    assert got == exact
    # the planted groups are exactly the recovered clusters
    assert all(a // 4 == b // 4 for a, b in got)
    assert len(got) == 30 * 6  # C(4,2) per group


def test_image_near_dups_plan_no_cartesian(spark):  # noqa: F811
    """The pairing is a keyed equi-join on (tbl, blk) — no cartesian /
    nested-loop join in the physical plan."""
    df = synth_dup_images_df(spark, n=48)
    plan = (
        image_near_dup_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_property_vectorized_equals_scalar_random_shapes():
    """Hypothesis fuzz: the integral-image vectorized dHash equals the
    nested-loop scalar spec on arbitrary image shapes and contents —
    incl. shapes far from multiples of the 8x9 grid."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    from language_detection_spark.queries import _dhash_scalar

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(min_value=8, max_value=97),
        w=st.integers(min_value=9, max_value=113),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, seed):
        rng = np.random.Generator(np.random.Philox(key=seed))
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert dhash_pixels(px) == _dhash_scalar(px)

    check()
