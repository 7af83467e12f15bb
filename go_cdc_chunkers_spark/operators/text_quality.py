"""Text analysis for a training-data pipeline: token counting, quality
scoring, language-ID heuristic, document fingerprinting. All pure column
expressions (codegen; no UDF), each with an ANSI-SQL twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A small multilingual stopword table for the n-gram/stopword language
# heuristic. Deterministic and public-knowledge words.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que"],
}


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate: tokens of <= 4
    chars count 1, longer words ceil(len/4) -- the standard cheap proxy for
    byte-pair token budgeting."""
    words = F.split(F.trim(F.col(text_col)), r" +")
    n_words = F.size(words)
    subword = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        subword.alias("n_subword_est"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / digit / mean-word-length features + a composite
    score in [0, 100] (integer; deterministic)."""
    t = F.col(text_col)
    n = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    n_words = F.size(F.split(F.trim(t), r" +"))
    mean_wlen = F.round(n / F.greatest(n_words, F.lit(1)), 4)
    score = (
        F.least(n_words, F.lit(50)).cast("double") * 1.0
        + F.when((n_alpha / F.greatest(n, F.lit(1))) > 0.7, 30.0).otherwise(0.0)
        + F.when((n_digit / F.greatest(n, F.lit(1))) < 0.2, 10.0).otherwise(0.0)
        + F.when((n_punct / F.greatest(n, F.lit(1))) < 0.1, 10.0).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n.cast("long").alias("n_chars"),
        n_alpha.cast("long").alias("n_alpha"),
        n_digit.cast("long").alias("n_digit"),
        n_punct.cast("long").alias("n_punct"),
        n_words.cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        F.least(F.round(score), F.lit(100.0)).cast("long").alias("quality_score"),
    )


def langid_heuristic(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language guess: count hits per language's stopword list
    over the token set; argmax with a deterministic tiebreak ('en' last).
    (On the synthetic corpus the labels are random, so the gate is
    Spark == oracle, not label accuracy.)"""
    words = F.split(F.trim(F.col(text_col)), r" +")
    votes = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    # argmax by (vote, lang) descending so ties break on language code.
    best = F.greatest(
        *[F.struct(v.alias("v"), F.lit(lang).alias("lang")) for lang, v in votes.items()]
    )
    out = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[votes[lang].cast("long").alias(f"votes_{lang}") for lang in sorted(STOPWORDS)],
        F.when(best["v"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
    )
    return out


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-trained bigram language-model score per document -- the
    CCNet-style "perplexity against an in-domain LM" quality signal, with
    the corpus itself as the training set (no external model):

        P(w2 | w1) = (C(w1,w2) + 1) / (C(w1) + V)     (add-one smoothing)
        score(doc) = mean over the doc's bigrams of log10 P

    V is the distinct-token vocabulary; C counts come from the whole
    input. Tokens are ' +'-split after trim (the module's tokenizer),
    empty tokens dropped; docs with < 2 tokens emit no row. Boilerplate
    and fluent text score high (their bigrams are corpus-frequent);
    gibberish and rare-word soup score low -- the standard cheap filter
    signal for pretraining corpora.

    Scale shape: two word-count aggregations (map-side combinable, token
    keyed), one per-doc window (partitions bounded by doc length), two
    token-keyed joins; the count relations are vocabulary-sized, so AQE
    broadcasts them when small. All JVM expressions, no UDF."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r" +")).alias(
            "pos", "tok"),
    ).filter(F.col("tok") != "")
    win = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.lead("tok").over(win).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    uni = toks.groupBy(F.col("tok").alias("w1")).agg(
        F.count("*").cast("long").alias("cu"))
    vocab = toks.select(F.countDistinct("tok").cast("long").alias("v"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("cb"))
    lp = (
        big.join(bc, ["w1", "w2"]).join(uni, "w1").crossJoin(vocab)
        .select("doc_id",
                F.log10((F.col("cb") + 1.0) / (F.col("cu") + F.col("v")))
                .alias("lp"))
    )
    return lp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_log10_prob"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Within-document repetition (the Gopher-rules quality filter):
    fraction of token n-grams that are repeats of an earlier occurrence
    in the same doc, plus the hottest n-gram's count. Templated spam and
    keyword-stuffed pages score high; natural prose scores near 0.

    dup_frac = (T - D) / T with T total and D distinct n-grams; docs
    with < n tokens emit no row. Exact integer counts + one rounded
    ratio; one explode + n-1 per-doc lead() windows + two aggregations,
    all map-side combinable after the (doc_id, ngram) groupBy."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r" +")).alias(
            "pos", "tok"),
    ).filter(F.col("tok") != "")
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(win) for i in
                              range(1, n)]
    grams = toks.select(
        "doc_id", F.concat_ws("\x1f", *parts).alias("gram"),
        parts[-1].isNotNull().alias("_full"),
    ).filter("_full")
    counts = grams.groupBy("doc_id", "gram").agg(
        F.count("*").cast("long").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_ngrams"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round((F.sum("c") - F.count("*")) / F.sum("c"), 6)
        .alias("dup_frac"),
        F.max("c").cast("long").alias("top_ngram_count"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum xxhash64 over each
    sliding window of word 2-gram hashes, collected as a sorted distinct
    set. Rows: (doc_id, fp long). SQL-oracle-able via the md5 variant in
    entry_queries (same shape, md5-based hash)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r" +").alias("_w"),
    )
    grams = words.select(
        "doc_id",
        F.when(
            F.size("_w") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - 2),
                lambda j: F.xxhash64(F.concat_ws(" ", F.slice("_w", j + 1, 2))),
            ),
        )
        .otherwise(F.array(F.xxhash64(F.concat_ws(" ", "_w"))))
        .alias("_g"),
    )
    mins = grams.select(
        "doc_id",
        F.when(
            F.size("_g") >= window,
            F.transform(
                F.sequence(F.lit(0), F.size("_g") - window),
                lambda j: F.array_min(F.slice("_g", j + 1, window)),
            ),
        )
        .otherwise(F.array(F.array_min("_g")))
        .alias("_m"),
    )
    return mins.select("doc_id", F.explode(F.array_distinct("_m")).alias("fp"))
