"""Video near-dup via per-frame perceptual hash: re-encode invariances,
distributed-vs-local decode+hash parity, banded pairing vs brute force."""

import pytest

from language_detection_spark.functions.codecs import decode_avi_frames
from language_detection_spark.functions.jpeg import decode_jpeg
from language_detection_spark.operators.multimodal import (
    dhash_pixels,
    sample_frame_indices,
    synth_dup_video_payloads,
    synth_dup_videos_df,
    video_frame_hashes,
    video_near_dup_pairs,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def truth():
    """Local single-threaded decode+hash of every sampled frame."""
    out = {}
    for mid, payload, _w, _h, _nf in synth_dup_video_payloads(36):
        frames = decode_avi_frames(payload)
        for i in sample_frame_indices(len(frames), 2, None):
            out[(mid, int(i))] = dhash_pixels(decode_jpeg(frames[i]))
    return out


def test_progressive_reencode_is_hash_identical(truth):
    """Variant 1 re-encodes the same frames with alternating progressive
    mode at the same quality — every sampled frame hash matches variant
    0 exactly."""
    for g in range(12):
        a, b = 3 * g, 3 * g + 1
        for (mid, fi), h in truth.items():
            if mid == a:
                assert truth[(b, fi)] == h


def test_quality_reencode_drifts_within_radius(truth):
    """Variant 2 re-encodes at quality 80: frames drift but stay within
    the Hamming-6 match radius of variant 0."""
    for g in range(12):
        a, c = 3 * g, 3 * g + 2
        for (mid, fi), h in truth.items():
            if mid == a:
                assert _ham(truth[(c, fi)], h) <= 6


def test_distributed_hashes_match_local(spark, truth):  # noqa: F811
    rows = video_frame_hashes(
        synth_dup_videos_df(spark, n=36), every_n=2
    ).collect()
    got = {(r["media_id"], r["frame_idx"]): r["dhash"] for r in rows}
    assert got == truth


def test_video_pairs_equal_brute_force(spark, truth):  # noqa: F811
    rows = video_near_dup_pairs(
        synth_dup_videos_df(spark, n=36), every_n=2,
        max_hamming=6, min_matched_frames=2,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["n_matched_frames"] for r in rows}
    from collections import Counter

    cnt: Counter = Counter()
    items = list(truth.items())
    for x, ((ma, fa), ha) in enumerate(items):
        for (mb, fb), hb in items[x + 1:]:
            if ma != mb and _ham(ha, hb) <= 6:
                cnt[(min(ma, mb), max(ma, mb))] += 1
    exact = {k: v for k, v in cnt.items() if v >= 2}
    assert got == exact
    assert all(a // 3 == b // 3 for a, b in got), "only planted groups pair"
    assert len(got) == 12 * 3  # every variant pair in every group
