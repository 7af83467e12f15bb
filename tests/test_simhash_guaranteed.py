"""Guaranteed-recall SimHash (Manku block-combination scheme) + the
multi-hub star-cap connectivity fix.

The adversarial fixture spreads flipped bits across ALL FOUR 16-bit pieces
of the default banding, so the default simhash_pairs misses those pairs by
construction (its documented recall trade above hamming 3) while
simhash_pairs_guaranteed must find every pair at hamming <= d -- recall
exactly 1.0, verified against a brute-force popcount over all pairs.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators import dedup_text


def _brute_pairs(sigs, d):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sigs.items()), 2):
        h = bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1")
        if h <= d:
            out.add((ia, ib, h))
    return out


def _to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.fixture(scope="module")
def adversarial_sigs():
    """id -> unsigned 64-bit fingerprint. Variant h flips h bits of the
    base, always touching all four 16-bit pieces (bits 1, 17, 33, 49, then
    consecutive bits from 2 up)."""
    base = 0x0123_4567_89AB_CDEF
    sigs = {0: base}
    for h in range(4, 13):
        flips = [1, 17, 33, 49] + list(range(2, 2 + h - 4))
        v = base
        for b in flips[:h]:
            v ^= 1 << b
        sigs[h] = v
    return sigs


def _sigs_df(spark, sigs):
    return spark.createDataFrame(
        [(int(i), _to_signed(s)) for i, s in sigs.items()],
        "clip_id long, simhash long",
    )


def _pieces_df(sdf):
    """The default 4x16 piece relation, built from raw signatures."""
    return sdf.select(
        "clip_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("piece_id"),
                F.shiftrightunsigned("simhash", 16 * i)
                .bitwiseAND(F.lit(0xFFFF)).alias("piece"),
            ) for i in range(4)
        ])).alias("_p"),
    ).select("clip_id", "simhash", "_p.piece_id", "_p.piece")


@pytest.mark.parametrize("d,k", [(7, None), (12, None), (12, 1), (6, 2)])
def test_guaranteed_recall_is_exactly_one(spark, adversarial_sigs, d, k):
    sdf = _sigs_df(spark, adversarial_sigs)
    got = {
        (r.a, r.b, r.hamming)
        for r in dedup_text.simhash_pairs_guaranteed_from_sigs(
            sdf, max_hamming=d, blocks_per_key=k
        ).collect()
    }
    assert got == _brute_pairs(adversarial_sigs, d)


def test_default_banding_misses_adversarial_pairs(spark, adversarial_sigs):
    """Documents the contrast: the (0, h) pairs touch every 16-bit piece, so
    the 4-piece banding cannot bucket them together -- they are invisible to
    the default path, found by the guaranteed path."""
    sdf = _sigs_df(spark, adversarial_sigs)
    banded = {
        (r.a, r.b)
        for r in dedup_text.simhash_pairs_from_pieces(
            _pieces_df(sdf), max_hamming=12, pair_cap=10_000
        ).collect()
    }
    missed = {(0, h) for h in range(4, 13)} - banded
    assert missed == {(0, h) for h in range(4, 13)}
    guaranteed = {
        (r.a, r.b)
        for r in dedup_text.simhash_pairs_guaranteed_from_sigs(
            sdf, max_hamming=12
        ).collect()
    }
    assert {(0, h) for h in range(4, 13)} <= guaranteed


def test_table_construction_covers_all_flip_patterns():
    """Pure-combinatorics check of the pigeonhole: for every way to damage
    d blocks, some table's k blocks are untouched."""
    for d, k in [(3, 1), (5, 2)]:
        n_blocks, kk, tables, widths = dedup_text._simhash_block_tables(d, k)
        assert sum(widths) == 64 and len(widths) == n_blocks == d + kk
        for damaged in itertools.combinations(range(n_blocks), d):
            dset = set(damaged)
            assert any(dset.isdisjoint(combo) for _tid, combo in tables)


def test_multi_hub_star_survives_outlier_hub(spark):
    """A hot bucket whose MIN-id member is a hamming outlier: with a single
    hub every star edge fails the filter (the round-2 silent-disconnect);
    with n_hubs=4 the close-knit members still pair through a good hub."""
    near = 0x00FF  # members 1..9: tiny mutual hamming
    far = _to_signed(0xFFFF_FFFF_FFFF_0000)  # member 0 (the min id): far away
    rows = [(0, 0, 7, far)] + [
        (i, 0, 7, near ^ (1 << (i % 3))) for i in range(1, 10)
    ]
    pieces = spark.createDataFrame(
        rows, "clip_id long, piece_id int, piece long, simhash long"
    )

    single = dedup_text.simhash_pairs_from_pieces(
        pieces, max_hamming=8, pair_cap=4, n_hubs=1
    ).collect()
    assert single == []  # the outlier hub disconnects everything

    multi = {
        (r.a, r.b)
        for r in dedup_text.simhash_pairs_from_pieces(
            pieces, max_hamming=8, pair_cap=4, n_hubs=4
        ).collect()
    }
    # hubs are ids 0..3; members 4..9 must each reach a non-outlier hub
    for m in range(4, 10):
        assert any((h, m) in multi for h in (1, 2, 3)), m
    assert not any(p for p in multi if 0 in p)  # outlier edges filtered

    capped = dedup_text.count_star_capped_buckets(pieces, pair_cap=4).collect()
    assert len(capped) == 1 and capped[0].bucket_size == 10


def test_star_cap_matches_exact_for_uniform_bucket(spark):
    """When the hot bucket IS near-identical fingerprints (the dominant hot
    case), the multi-hub star keeps every member in one component."""
    rows = [(i, 0, 7, 3 ^ (i & 1)) for i in range(12)]
    pieces = spark.createDataFrame(
        rows, "clip_id long, piece_id int, piece long, simhash long"
    )
    pairs = dedup_text.simhash_pairs_from_pieces(
        pieces, max_hamming=2, pair_cap=4, n_hubs=2
    )
    got = {(r.a, r.b) for r in pairs.collect()}
    # star edges: every member reaches hub 0 or hub 1 (both near)
    reached = {0, 1}
    for a, b in sorted(got):
        if a in reached:
            reached.add(b)
    assert reached == set(range(12))
