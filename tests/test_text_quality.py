"""Semantic pins for the corpus-level text-quality filters (the
relational mechanics are driver-oracled; these pin the signals' meaning)."""


def test_repetition_stats_flags_templated_spam(spark):
    from go_cdc_chunkers_spark.operators.text_quality import repetition_stats

    spam = " ".join(["buy cheap pills now"] * 10)
    prose = ("the quick brown fox jumps over a lazy dog while seven "
             "wizards brew tonic near the quiet harbor at dusk")
    docs = spark.createDataFrame(
        [(0, spam), (1, prose), (2, "one two")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert 2 not in out                       # < 3 tokens -> no row
    assert out[0]["dup_frac"] > 0.8           # templated repetition
    assert out[1]["dup_frac"] == 0.0          # natural prose
    assert out[0]["top_ngram_count"] == 10    # "buy cheap pills" x10
    assert out[0]["n_ngrams"] == 38 and out[1]["n_distinct"] == 18


def test_bigram_lm_scores_rank_fluent_over_gibberish(spark):
    """Documents made of corpus-frequent bigrams outscore rare-bigram
    gibberish, and the relation drops sub-2-token docs."""
    from go_cdc_chunkers_spark.operators.text_quality import bigram_lm_scores

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(8)]
        + [(8, "zq xv qqj zzk wvx plf"), (9, "one")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert 9 not in out                        # < 2 tokens -> no row
    assert out[0]["n_bigrams"] == 5
    assert out[0]["avg_log10_prob"] > out[8]["avg_log10_prob"] + 0.3
