"""Benchmark decontamination (dedup_text.decontaminate).

Semantics: a train doc is flagged iff it shares >= 1 exact word n-gram
with any eval doc; counts are over DISTINCT grams / eval docs. The
xxhash64 production flavor (8-byte gram keys in the broadcast) must agree
with the raw-string oracle flavor row-for-row, and the gram join must be
a broadcast hash join (the 100 TB shape: the corpus never shuffles for
the probe).
"""

import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.operators.dedup_text import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # eval: two benchmark docs; train: one verbatim leak, one partial leak,
    # one clean doc, one short exact copy (< n tokens), one short clean doc.
    ev = _docs(spark, [
        (1000, "the quick brown fox jumps over the lazy dog"),
        (1001, "pack my box with five dozen liquor jugs"),
    ])
    tr = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),      # verbatim
        (2, "intro words then pack my box with five dozen extra"),  # partial
        (3, "completely unrelated text about spark partitions here"),
        (4, "pack my box"),                                       # short copy? no: 3 tokens, whole-gram "pack my box" not an eval gram at n=5
        (5, "tiny doc"),
    ])
    return tr, ev


def test_flagging_and_counts(spark, corpus):
    tr, ev = corpus
    out = {r["doc_id"]: r for r in decontaminate(tr, ev, n=5, hash_flavor="raw").collect()}
    # doc 1: 9 tokens -> 5 distinct 5-grams, all present in eval doc 1000
    assert out[1]["n_hit_ngrams"] == 5 and out[1]["n_grams"] == 5
    assert out[1]["n_eval_docs"] == 1 and out[1]["hit_frac"] == 1.0
    # doc 2: shares the 5-gram "pack my box with five" (+ "my box with five dozen")
    assert out[2]["n_hit_ngrams"] == 2 and out[2]["n_eval_docs"] == 1
    # clean and short-clean docs absent; doc 4's whole-text gram is not an
    # eval 5-gram (short docs hash their full text, eval grams are 5-grams)
    assert 3 not in out and 4 not in out and 5 not in out


def test_short_doc_exact_copy_is_caught(spark):
    # an eval doc shorter than n contributes its whole text as one gram, so
    # a short train doc that is a verbatim copy of a short eval doc is hit
    ev = _docs(spark, [(1000, "two tokens")])
    tr = _docs(spark, [(1, "two tokens"), (2, "other text")])
    out = decontaminate(tr, ev, n=13, hash_flavor="raw").collect()
    assert [(r["doc_id"], r["n_hit_ngrams"]) for r in out] == [(1, 1)]


def test_xxhash64_flavor_matches_raw(spark, corpus):
    tr, ev = corpus
    raw = sorted(map(tuple, decontaminate(tr, ev, n=5, hash_flavor="raw").collect()))
    fast = sorted(map(tuple, decontaminate(tr, ev, n=5, hash_flavor="xxhash64").collect()))
    assert raw == fast and len(raw) == 2


def test_gram_join_is_broadcast_no_python(spark, corpus):
    tr, ev = corpus
    plan = decontaminate(tr, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bad_flavor_raises(spark, corpus):
    tr, ev = corpus
    with pytest.raises(ValueError, match="hash_flavor"):
        decontaminate(tr, ev, hash_flavor="sha1")
