"""MJPEG-in-AVI container + video near-dup channel (operators/avi.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators.avi import (
    avi_encode, avi_frame_jpegs, avi_info, avi_pixels, dhash_from_cells,
    mjpeg_frame_cells, mjpeg_frame_hashes, video_near_pairs,
)
from go_cdc_chunkers_spark.operators.imagehash import dhash64
from go_cdc_chunkers_spark.operators.jpeg import jpeg_pixels


def _frames(n, w=48, h=32, seed=0, shift=0):
    """Deterministic JPEG-friendly frames with a MOVING bright block, so
    each frame's dHash differs (a phase-shifted smooth gradient would not:
    dHash compares horizontal neighbors, and a translated gradient keeps
    every comparison)."""
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 160 // max(w - 1, 1) + seed * 31) % 256
        g = (yy * 160 // max(h - 1, 1) + seed * 53) % 256
        b = np.full((h, w), (seed * 17) % 256)
        img = np.stack([r, g, b], axis=2).astype(np.uint8)
        t = i + shift
        # block trajectory depends on seed, so different seeds give
        # structurally different videos (not just recolored ones)
        x0 = (t * (3 + seed % 5) + seed * 11) % max(w - w // 4, 1)
        y0 = (t * (2 + seed % 3) + seed * 5) % max(h - h // 3, 1)
        img[y0:y0 + h // 3, x0:x0 + w // 4, :] = 250 if seed % 2 else 5
        out.append(img)
    return out


def test_container_roundtrip_and_metadata():
    frames = _frames(7, w=50, h=30)  # odd-ish dims; jpeg pads internally
    raw = avi_encode(frames, fps=12, quality=90)
    info = avi_info(raw)
    assert (info["width"], info["height"]) == (50, 30)
    assert info["fps"] == 12.0 and info["n_frames"] == 7
    # every frame chunk is a standalone JPEG that decodes to frame dims
    for i, (idx, px) in enumerate(avi_pixels(raw)):
        assert idx == i and px.shape == (30, 50, 3)


def test_frame_sampling_slices_without_decoding():
    frames = _frames(10)
    raw = avi_encode(frames, fps=10)
    sampled = avi_frame_jpegs(raw, every_n=3)
    assert [i for i, _ in sampled] == [0, 3, 6, 9]
    # sampled bytes are the same standalone JPEGs a full walk yields
    full = dict(avi_frame_jpegs(raw, every_n=1))
    assert all(j == full[i] for i, j in sampled)


def test_decode_matches_standalone_jpeg():
    from go_cdc_chunkers_spark.operators.jpeg import jpeg_encode

    frames = _frames(3)
    raw = avi_encode(frames, fps=10, quality=85)
    for i, j in avi_frame_jpegs(raw):
        assert j == jpeg_encode(frames[i], quality=85)
        assert np.array_equal(jpeg_pixels(j), jpeg_pixels(jpeg_encode(frames[i], quality=85)))


def test_odd_sized_payload_padding():
    # force an odd jpeg size by trying qualities; parser must keep walking
    for q in range(80, 98):
        frames = _frames(3, w=40, h=24, seed=q)
        raw = avi_encode(frames, fps=10, quality=q)
        sizes = [len(j) for _, j in avi_frame_jpegs(raw)]
        assert len(sizes) == 3
        if any(s % 2 for s in sizes):
            return
    pytest.skip("no odd-size jpeg produced")


def test_non_mjpeg_codec_raises():
    frames = _frames(2)
    raw = bytearray(avi_encode(frames, fps=10))
    i = raw.find(b"MJPG")
    while i != -1:
        raw[i:i + 4] = b"H264"
        i = raw.find(b"MJPG")
    with pytest.raises(NotImplementedError, match="H264"):
        avi_info(bytes(raw))


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="RIFF"):
        avi_info(b"\x89PNG1234567890")


def test_truncated_avi_raises_cleanly():
    """Every truncation point either raises a clean ValueError (or the
    codec-gate NotImplementedError) or parses with ALL frame byte ranges
    inside the buffer -- never struct.error, never a silent short frame
    slice that would decode garbage downstream."""
    frames = _frames(3, w=24, h=16)
    raw = avi_encode(frames, fps=10)
    for cut in range(0, len(raw)):
        try:
            info = avi_info(raw[:cut])
        except (ValueError, NotImplementedError):
            continue
        for off, sz in info["frames"]:
            assert off + sz <= cut, (cut, off, sz)


def _videos_df(spark, items):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in items], "item_id string, bytes binary")


def test_frame_hashes_match_numpy(spark):
    frames = _frames(6)
    raw = avi_encode(frames, fps=10)
    rows = mjpeg_frame_hashes(_videos_df(spark, [("v", raw)]), every_n=2).collect()
    got = {r["frame_idx"]: r["dhash"] for r in rows}
    want = {i: dhash64(px) for i, px in avi_pixels(raw, every_n=2)}
    assert got == want and set(got) == {0, 2, 4}


def test_cells_rebuild_hash_relationally(spark):
    frames = _frames(5)
    raw = avi_encode(frames, fps=10)
    vids = _videos_df(spark, [("v", raw)])
    rebuilt = {(r["item_id"], r["frame_idx"]): r["dhash"]
               for r in dhash_from_cells(mjpeg_frame_cells(vids)).collect()}
    direct = {(r["item_id"], r["frame_idx"]): r["dhash"]
              for r in mjpeg_frame_hashes(vids).collect()}
    assert rebuilt == direct and len(direct) == 5


@pytest.fixture(scope="module")
def video_corpus(spark):
    base = _frames(12, seed=1)
    other = _frames(12, seed=9)
    items = [
        ("base", avi_encode(base, fps=10, quality=90)),
        # re-encode at a different quality: lossy, but dHash-stable
        ("reenc", avi_encode(base, fps=10, quality=70)),
        # trimmed copy: first 4 frames dropped -> alignment offset -4
        ("trim", avi_encode(base[4:], fps=10, quality=90)),
        ("other", avi_encode(other, fps=10, quality=90)),
    ]
    return _videos_df(spark, items)


def test_video_near_pairs_recall_and_alignment(spark, video_corpus):
    hashes = mjpeg_frame_hashes(video_corpus)
    pairs = {(r["a"], r["b"]): r for r in
             video_near_pairs(hashes, min_aligned=3).collect()}
    assert ("base", "reenc") in pairs
    assert pairs[("base", "reenc")]["offset"] == 0
    assert pairs[("base", "trim")]["offset"] == 4  # base frame 4 == trim frame 0
    assert not any("other" in k for k in pairs), pairs


def test_video_near_pairs_plan_is_jvm_after_hashing(spark, video_corpus):
    hashes = mjpeg_frame_hashes(video_corpus)
    plan = video_near_pairs(hashes)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the stop-hash prune


def test_video_decode_runs_once(spark):
    """The plan fans out into four branches; the persist on the
    canonicalized hashes must keep the JPEG decode at ONE pass per video
    (without it: measured 2x even with AQE exchange reuse)."""
    from go_cdc_chunkers_spark.operators import avi as A

    acc = spark.sparkContext.accumulator(0)
    orig = A.avi_frame_jpegs

    def counting(raw, every_n=1):
        acc.add(1)
        return orig(raw, every_n)

    A.avi_frame_jpegs = counting
    try:
        base = _frames(12, seed=1)
        vids = _videos_df(spark, [
            ("base", avi_encode(base, fps=10, quality=90)),
            ("trim", avi_encode(base[4:], fps=10, quality=90)),
        ])
        out = video_near_pairs(mjpeg_frame_hashes(vids), min_aligned=3)
        assert [(r["a"], r["b"], r["offset"]) for r in out.collect()] == [
            ("base", "trim", 4)]
        assert acc.value == 2  # one container walk per video, total
    finally:
        A.avi_frame_jpegs = orig


def test_stop_hash_prune_drops_boilerplate(spark):
    """20 videos share a two-frame title sequence (cards at frames 0-1, so
    every pair aligns at offset 0 with n_aligned=2 -- alignment alone can't
    reject it); each also has 3 unique frames. Pins that boilerplate is
    killed by EITHER control: exact stop-hash df prune, or the band-bucket
    skew cap -- and by neither being off."""
    cards = _frames(1, seed=3) + _frames(1, seed=6, shift=9)
    assert dhash64(cards[0]) != dhash64(cards[1])
    items = [(f"v{i}", avi_encode(cards + _frames(3, seed=100 + i), fps=10))
             for i in range(20)]
    hashes = mjpeg_frame_hashes(_videos_df(spark, items)).persist()
    # no control: the title sequence welds all 190 pairs together
    welded = video_near_pairs(hashes, max_df=10**9).collect()
    assert len(welded) == 190
    assert all(r["offset"] == 0 and r["n_aligned"] >= 2 for r in welded)
    # stop-hash prune alone (cards have df=20 > 16); residual coincidental
    # single-frame near-matches between random frames die at min_aligned=2
    assert video_near_pairs(hashes, max_df=16).collect() == []
    # band-bucket skew cap alone: the cards' buckets hold 20 videos > 16,
    # so their join rows are dropped before the join ever fans out
    assert video_near_pairs(hashes, max_df=10**9,
                            max_band_df=16).collect() == []
    hashes.unpersist()


def test_video_cli_file_tree(tmp_path):
    """jobs/video.py over a file tree: base / 4-frame-trimmed copy /
    unrelated -> exactly the (base, trim) pair at offset 4."""
    import json
    import subprocess
    import sys

    base = _frames(12, seed=1)
    (tmp_path / "vids").mkdir()
    for name, frames in [("base", base), ("trim", base[4:]),
                         ("other", _frames(12, seed=9))]:
        (tmp_path / "vids" / f"{name}.avi").write_bytes(
            avi_encode(frames, fps=10, quality=90))
    r = subprocess.run(
        [sys.executable, "jobs/video.py", "--path", str(tmp_path / "vids"),
         "--min-aligned", "3", "--cpus", "4",
         "--hashes", str(tmp_path / "hashes")],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_videos"] == 3 and out["n_frame_hashes"] == 32
    assert len(out["pairs"]) == 1
    a, b, offset, n_aligned, _n = out["pairs"][0]
    assert a.endswith("base.avi") and b.endswith("trim.avi")
    assert offset == 4 and n_aligned >= 3
    assert (tmp_path / "hashes" / "_SUCCESS").exists()


def test_caps_keep_genuine_dup_recall(spark):
    # a real near-dup pair among the boilerplate crowd survives both caps
    cards = _frames(1, seed=3) + _frames(1, seed=6, shift=9)
    base = _frames(6, seed=77)
    items = [(f"v{i}", avi_encode(cards + _frames(3, seed=100 + i), fps=10))
             for i in range(20)]
    items += [("dup_a", avi_encode(cards + base, fps=10)),
              ("dup_b", avi_encode(cards + base[2:], fps=10, quality=80))]
    hashes = mjpeg_frame_hashes(_videos_df(spark, items))
    pairs = {(r["a"], r["b"]): r for r in video_near_pairs(
        hashes, max_df=18, max_band_df=18).collect()}
    assert ("dup_a", "dup_b") in pairs
    assert pairs[("dup_a", "dup_b")]["offset"] == 2
    assert len(pairs) == 1, pairs
