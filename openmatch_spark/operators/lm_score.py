"""N-gram language-model quality scoring — the CCNet signal (Wenzek et
al. 2020: docs are ranked by the perplexity of a KenLM 5-gram trained on
Wikipedia; low perplexity ~ clean prose, high ~ boilerplate/gibberish).

The Spark-sane twin is a Jelinek-Mercer interpolated BIGRAM model
computed entirely in DataFrame algebra — no external model artifact, no
UDF, trainable on any reference corpus in one pass:

    p(w | v) = lam * c2(v w) / cp(v)  +  (1 - lam) * c1(w) / T
    log_prob(doc) = ln p1(w_0) + sum_{i>=1} ln p(w_i | w_{i-1})
    cross_entropy = -log_prob / n_tokens      perplexity = e^H

where c1 = unigram counts, T = reference token count, c2 = bigram counts,
and cp(v) = bigrams starting with v (the MLE context count). The
unigram back-off term makes every in-vocabulary continuation finite;
out-of-vocabulary tokens (possible when reference != corpus) fall back
to an add-one floor 1/(T+1) so the score stays defined, flagged via
n_oov. Honest scope: a bigram JM model is a weaker discriminator than
KenLM's pruned 5-gram, but it is the same decision signal, fully
reproducible, and oracle-checkable.

Scale shape: counting is two partial-aggregated shuffles over reference
tokens/bigrams (the same corpus-token-proportional shape as winnowing /
boilerplate removal); scoring joins each doc's DISTINCT bigrams (with
multiplicity) against the count tables — Σ per-doc distinct bigrams rows
through one join — and folds per doc with one final groupBy. Nothing is
collected to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.analysis import tokenize_col

_BUCKET_NAMES = ("head", "middle", "tail")


def _toks(df: DataFrame, analyzer: str, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("t"),
    )


def _bigrams(toks: DataFrame) -> DataFrame:
    """(doc_id, bg) one row per bigram occurrence — 'v w' string keys
    (terms cannot contain spaces under any analyzer here, so the join key
    is unambiguous and SQL-replicable)."""
    n = F.size("t")
    return toks.where(n >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("t", 1, n - 1),
                F.slice("t", 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )


def ngram_lm_scores(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    lam: float = 0.9,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, log_prob, cross_entropy, perplexity) —
    per-doc score under a JM-interpolated bigram LM trained on
    ``reference`` (default: the corpus itself — the self-scoring mode;
    pass a held-out clean corpus for the true CCNet setup). Empty docs
    report n_tokens=0 with NULL score columns."""
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lambda must be in (0, 1), got {lam}")
    ref = reference if reference is not None else corpus
    # three consumers each (unigram counts / total / bigram counts, and
    # sizes / first-token / bigrams on the scoring side): persist the
    # tokenized frames so the corpus is scanned+tokenized once per side,
    # not once per aggregate (MEMORY_AND_DISK — spills, never recomputes)
    ref_toks = _toks(ref, analyzer, id_col, text_col).persist()
    uni = (
        ref_toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    total = float(
        ref_toks.select(F.sum(F.size("t")).alias("n")).collect()[0]["n"] or 0
    )
    if total <= 0:
        raise ValueError("reference corpus has no tokens")
    c2 = (
        _bigrams(ref_toks)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    cp = (
        c2.groupBy(F.split("bg", " ")[0].alias("v"))
        .agg(F.sum("c2").alias("cp"))
    )

    toks = (
        ref_toks if reference is None
        else _toks(corpus, analyzer, id_col, text_col).persist()
    )
    sizes = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    floor = F.lit(1.0 / (total + 1.0))

    # first token: unigram probability (OOV -> floor)
    first = (
        toks.where(F.size("t") >= 1)
        .select("doc_id", F.col("t")[0].alias("w"))
        .join(uni, "w", "left")
        .select(
            "doc_id",
            F.lit(1.0).alias("n"),
            F.coalesce(F.col("c1") / F.lit(total), floor).alias("p"),
            F.when(F.col("c1").isNull(), 1).otherwise(0).cast("long").alias("oov"),
        )
    )
    # bigram continuations with multiplicity; a bigram unseen in the
    # reference still gets the unigram back-off for its CONTINUATION word,
    # and an OOV continuation gets the floor
    doc_bg = (
        _bigrams(toks)
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .withColumn("v", F.split("bg", " ")[0])
        .withColumn("w", F.split("bg", " ")[1])
    )
    cont = (
        doc_bg.join(c2, "bg", "left")
        .join(cp, "v", "left")
        .join(uni, "w", "left")
        .select(
            "doc_id",
            "n",
            F.coalesce(
                F.lit(lam) * (F.col("c2") / F.col("cp"))
                + F.lit(1.0 - lam) * (F.col("c1") / F.lit(total)),
                F.lit(1.0 - lam) * (F.col("c1") / F.lit(total)),
                floor,
            ).alias("p"),
            F.when(F.col("c1").isNull(), F.col("n").cast("long"))
            .otherwise(0).alias("oov"),
        )
    )
    scored = (
        first.unionByName(cont)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.log("p")).alias("log_prob"),
            F.sum("oov").cast("long").alias("n_oov"),
        )
    )
    return (
        sizes.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            "log_prob",
            (-F.col("log_prob") / F.col("n_tokens")).alias("cross_entropy"),
            F.exp(-F.col("log_prob") / F.col("n_tokens")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    lam: float = 0.9,
    analyzer: str = "simple",
    fractions: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    round_to: int = 6,
    approx: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, perplexity, bucket) — the CCNet selection step:
    docs split into 'head' / 'middle' / 'tail' by LM perplexity (Wenzek et
    al. 2020 keep head+middle and drop tail as likely gibberish).

    Thresholds are the ``fractions`` percentiles of the ROUNDED perplexity
    distribution (rounding first makes the cut reproducible across
    engines and runs; exact PERCENTILE_CONT by default). At 100 TB pass
    ``approx=True``: percentile_approx turns the threshold computation
    into one sketch aggregate — the bucket assignment itself is always a
    broadcast-free projection against two scalar thresholds. Docs with no
    score (empty after analysis) get bucket NULL, never 'tail': absence
    of evidence is not evidence of gibberish."""
    if not (0.0 < fractions[0] < fractions[1] < 1.0):
        raise ValueError(f"fractions must be 0 < f1 < f2 < 1, got {fractions}")
    scores = ngram_lm_scores(
        corpus, reference=reference, lam=lam, analyzer=analyzer,
        id_col=id_col, text_col=text_col,
    ).select(
        "doc_id", "n_tokens",
        F.round("perplexity", round_to).alias("perplexity"),
    )
    # the threshold collect below and the returned projection would each
    # re-run the whole LM DAG (tokenize + three count aggregates + the
    # per-doc fold) — materialize it once
    scores = scores.localCheckpoint(eager=True)
    pct = F.percentile_approx if approx else F.percentile
    row = scores.where(F.col("perplexity").isNotNull()).agg(
        pct("perplexity", F.array(F.lit(fractions[0]), F.lit(fractions[1]))).alias("t")
    ).collect()[0]["t"]
    if row is None:
        return scores.withColumn("bucket", F.lit(None).cast("string"))
    t1, t2 = float(row[0]), float(row[1])
    bucket = (
        F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
        .when(F.col("perplexity") <= F.lit(t1), F.lit(_BUCKET_NAMES[0]))
        .when(F.col("perplexity") <= F.lit(t2), F.lit(_BUCKET_NAMES[1]))
        .otherwise(F.lit(_BUCKET_NAMES[2]))
    )
    return scores.withColumn("bucket", bucket)
