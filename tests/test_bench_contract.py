"""Driver-facing bench stdout contract (VERDICT r4 item 1).

The driver captures only the last ~2,000 chars of `python bench.py`
stdout and parses the final line as the round's BENCH_r{N}.json. Round 4
broke this by merging the ~6 KB BENCH_EVIDENCE blob into the headline
line (parsed: null). These tests pin the fixed contract: the headline is
the LAST line, compact, parseable; the evidence blob is its own earlier
line. No Spark session needed -- `emit_lines` is pure formatting.
"""
import json
import os

import bench

# Representative shapes copied from the r3 parsed artifact (the widest
# headline shipped so far): all query keys plus every in-run extra.
TIMINGS = {
    "cdc_chunk_throughput": 2.702, "cdc_chunk_throughput_poly128": 2.576,
    "neardup_pipeline": 13.153, "tpch_q1_pricing": 0.344,
    "region_revenue_rollup": 0.517, "top_orders_per_customer": 0.742,
    "doc_exact_dedup": 0.252, "doc_length_stats": 0.206,
    "cdc_resync_sweep": 5.786, "skew_candidate_stage": 16.77,
}
EXTRAS = {
    "n_clips": 2000, "corpus_mb": 310.06, "mb_per_sec": 3051.86,
    "n_chunks": 311113, "throughput_replicate": 24,
    "mb_per_sec_poly128": 3214.29, "clips_per_sec": 152.06,
    "resync_shared_pct_n1": 0.9871, "resync_shared_pct_n4": 0.9481,
    "resync_shared_pct_n16": 0.8116, "resync_shared_pct_n64": 0.4507,
    "resync_monotone": True, "skew_n_clips": 8000,
    "skew_const_frac": 0.2, "skew_bucket_max": 800,
    "skew_bucket_median": 2, "skew_pairs_hot_bucket": 319600,
    "skew_pairs_total_uncapped": 21139364,
    "skew_candidates_sec_capped": 1.946, "skew_candidates_capped": 1598,
}


def test_headline_is_last_line_compact_and_parseable():
    lines = bench.emit_lines(TIMINGS, EXTRAS, "0.1")
    head = lines[-1]
    assert len(head) < 2000
    parsed = json.loads(head)
    assert parsed["metric"] == "engine_bench_total"
    assert parsed["queries"] == TIMINGS
    assert parsed["value"] == round(sum(TIMINGS.values()), 3)
    assert parsed["sf"] == 0.1
    assert "evidence_artifacts" not in parsed


def test_evidence_blob_is_separate_earlier_line():
    lines = bench.emit_lines(TIMINGS, EXTRAS, "0.1")
    ev_path = os.path.join(os.path.dirname(bench.__file__),
                           "BENCH_EVIDENCE.json")
    if not os.path.exists(ev_path):
        assert len(lines) == 1
        return
    assert len(lines) == 2
    ev = json.loads(lines[0])
    assert ev["metric"] == "evidence_artifacts"
    with open(ev_path) as f:
        assert ev["artifacts"] == json.load(f)


def test_committed_evidence_headline_still_fits_with_slack():
    # Guard against extras creep: even with 25% growth in every key name
    # and value width, the headline must clear the 2,000-char capture.
    lines = bench.emit_lines(TIMINGS, EXTRAS, "0.1")
    assert len(lines[-1]) < 1500
