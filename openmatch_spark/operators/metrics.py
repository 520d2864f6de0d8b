"""Rank metrics as Spark aggregations (SURVEY §2.4 A3-A6).

Reference implementations these mirror:
- MRR@cutoff: scripts/evaluate.py:16-39 and the official
  scripts/ANCE-Tele/ms_marco_eval.py:120-150 (MaxMRRRank=10) — mean over
  qrels qids of 1/first-relevant-rank within cutoff (0 when none).
- nDCG@k: driver/beir_eval_pipeline.py:106-107 delegates to pytrec_eval
  ndcg_cut.10; we implement the standard formulation natively:
  DCG = sum(gain/log2(rank+1)) over relevant retrieved docs at rank<=k with
  gain = 2^rel - 1, IDCG from the qrels sorted by rel desc.
- Accuracy@k (QA): scripts/evaluate.py:76-94 + has_answers
  (qa_utils.py:206-221): indicator that some rank<=k doc contains an answer.
- duplicate check: ms_marco_eval.py:100-117.

Denominator convention (reference: evaluate.py:23-26, ms_marco_eval.py:133-143):
metrics average over qids PRESENT IN QRELS; a qrels qid missing from the run
contributes 0.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from openmatch_spark.operators.runio import with_rank


def _ranked(run: DataFrame) -> DataFrame:
    return run if "rank" in run.columns else with_rank(run)


def mrr_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row: (mrr double, n_queries long)."""
    r = _ranked(run).where(F.col("rank") <= k)
    hit = r.join(qrels.select("query_id", "doc_id"), ["query_id", "doc_id"])
    first = hit.groupBy("query_id").agg(F.min("rank").alias("first_rank"))
    per_q = (
        qrels.select("query_id").distinct()
        .join(first, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)).alias("rr"),
        )
    )
    return per_q.agg(
        F.avg("rr").alias("mrr"), F.count(F.lit(1)).alias("n_queries")
    )


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 100) -> DataFrame:
    """One row: (recall double, n_queries long) — macro-averaged per query."""
    r = _ranked(run).where(F.col("rank") <= k)
    found = (
        qrels.select("query_id", "doc_id")
        .join(r.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    total = qrels.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    per_q = total.join(found, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_rel")).alias("recall_q"),
    )
    return per_q.agg(
        F.avg("recall_q").alias("recall"), F.count(F.lit(1)).alias("n_queries")
    )


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row: (ndcg double, n_queries long). Gain 2^rel - 1 (trec_eval)."""
    r = _ranked(run).where(F.col("rank") <= k)
    dcg = (
        r.join(qrels, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + 1.0)
            ).alias("dcg")
        )
    )
    from pyspark.sql import Window

    iw = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = (
        qrels.withColumn("irank", F.row_number().over(iw))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    per_q = idcg.join(dcg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg_q"),
    )
    return per_q.agg(
        F.avg("ndcg_q").alias("ndcg"), F.count(F.lit(1)).alias("n_queries")
    )


@pandas_udf(BooleanType())
def has_answers_udf(text: pd.Series, answers: pd.Series) -> pd.Series:
    """Vectorized has_answers (qa_utils.py:206-221): NFD-normalized, uncased,
    token-level sliding-window subsequence match using the DPR tokenizer."""
    import unicodedata

    from openmatch_spark.analysis import tokenize_dpr_py

    def one(t, ans):
        if t is None or ans is None:
            return False
        toks = tokenize_dpr_py(unicodedata.normalize("NFD", t))
        for a in ans:
            at = tokenize_dpr_py(unicodedata.normalize("NFD", a))
            if not at:
                continue
            for i in range(0, len(toks) - len(at) + 1):
                if toks[i : i + len(at)] == at:
                    return True
        return False

    return pd.Series([one(t, a) for t, a in zip(text, answers)])


@pandas_udf(BooleanType())
def has_answers_regex_udf(text: pd.Series, answers: pd.Series) -> pd.Series:
    """Vectorized regex-mode has_answers (qa_utils.py:190-199, 206-211):
    NFD-normalize text AND pattern, then IGNORECASE|UNICODE|MULTILINE search;
    an uncompilable pattern matches nothing (reference returns False)."""
    import re
    import unicodedata

    flags = re.IGNORECASE | re.UNICODE | re.MULTILINE
    cache: dict = {}

    def pat(p):
        if p not in cache:
            try:
                cache[p] = re.compile(unicodedata.normalize("NFD", p), flags)
            except BaseException:
                cache[p] = None
        return cache[p]

    def one(t, ans):
        if t is None or ans is None:
            return False
        nt = unicodedata.normalize("NFD", t)
        for a in ans:
            rx = pat(a)
            if rx is not None and rx.search(nt) is not None:
                return True
        return False

    return pd.Series([one(t, a) for t, a in zip(text, answers)])


def _simple_containment_hit(text, answers):
    """SQL-expressible answer containment: simple-analyzer token-subsequence
    match == substring match over space-joined normalized tokens. Pure JVM
    column algebra, replicated exactly by the DuckDB oracle."""
    from openmatch_spark.analysis import tokenize_col

    doc_norm = F.concat(
        F.lit(" "), F.concat_ws(" ", tokenize_col(text, "simple")), F.lit(" ")
    )
    ans_norm = lambda a: F.concat_ws(" ", tokenize_col(a, "simple"))  # noqa: E731
    return F.exists(
        answers,
        lambda a: (F.length(ans_norm(a)) > 0)
        & doc_norm.contains(F.concat(F.lit(" "), ans_norm(a), F.lit(" "))),
    )


def accuracy_at_k(
    run: DataFrame,
    corpus: DataFrame,
    answers: DataFrame,
    ks: list[int] | None = None,
    match_mode: str = "dpr",
) -> DataFrame:
    """(k, accuracy, n_queries) rows for k in ks (scripts/evaluate.py:76-94).

    corpus: (doc_id, text); answers: (query_id, answers array<string>).
    match_mode: "dpr" = reference-exact NFD/DPR sliding-window match
    (qa_utils.py:206-221, pandas UDF); "regex" = reference regex mode
    (qa_utils.py:190-199); "simple" = simple-analyzer token containment
    (pure column algebra, DuckDB-cross-checkable).

    Single aggregation pass: first-hit per query once, then one groupBy over
    the tiny (query x k) cross — not one job per k.
    """
    ks = ks or [1, 5, 20, 100]
    r = _ranked(run).where(F.col("rank") <= max(ks))
    hydrated = r.join(corpus.select("doc_id", "text"), "doc_id").join(
        F.broadcast(answers), "query_id"
    )
    if match_mode == "simple":
        hit = _simple_containment_hit(F.col("text"), F.col("answers"))
    elif match_mode == "regex":
        hit = has_answers_regex_udf("text", "answers")
    else:
        hit = has_answers_udf("text", "answers")
    flagged = hydrated.withColumn("hit", hit)
    first = flagged.where("hit").groupBy("query_id").agg(F.min("rank").alias("first_hit"))
    base = answers.select("query_id").distinct().join(first, "query_id", "left")
    spark = answers.sparkSession
    ks_df = spark.createDataFrame([(int(k),) for k in ks], "k int")
    return (
        base.crossJoin(F.broadcast(ks_df))
        .groupBy("k")
        .agg(
            F.avg(
                F.when(F.col("first_hit") <= F.col("k"), 1.0).otherwise(0.0)
            ).alias("accuracy"),
            F.count(F.lit(1)).alias("n_queries"),
        )
        .select("k", "accuracy", "n_queries")
    )


def duplicate_docs(run: DataFrame) -> DataFrame:
    """(query_id, doc_id, n) rows where a doc is ranked more than once per
    query (ms_marco_eval.py:100-117 sanity check)."""
    return (
        run.groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def err_at_k(
    run: DataFrame, qrels: DataFrame, k: int = 10, max_rel: int = 3
) -> DataFrame:
    """(query_id, err) — Expected Reciprocal Rank at k (Chapelle et al.
    2009), the graded cascade metric: a user scans down the list and stops
    at a document with probability R_r = (2^rel - 1) / 2^max_rel, so

        ERR@k = sum_{r<=k}  (1/r) * R_r * prod_{i<r} (1 - R_i)

    Unjudged docs get rel 0 (R=0): they never stop the user but still
    occupy their rank. Per-query rows (average downstream as needed).

    The cascade product is a cumulative window — exp of the running sum of
    ln(1-R) in rank order, which both this engine and the SQL oracle
    evaluate in the SAME (rank) order, so the floats agree; R < 1 always
    because rel <= max_rel, so the log is finite."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    r = _ranked(run).where(F.col("rank") <= k)
    graded = (
        r.join(qrels, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "rank",
            (
                (F.pow(F.lit(2.0), F.coalesce(F.col("rel"), F.lit(0)).cast("double")) - 1.0)
                / F.lit(float(2 ** max_rel))
            ).alias("R"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = graded.select(
        "query_id",
        (
            F.col("R")
            * F.exp(F.coalesce(F.sum(F.log(1.0 - F.col("R"))).over(w), F.lit(0.0)))
            / F.col("rank")
        ).alias("c"),
    )
    return contrib.groupBy("query_id").agg(F.round(F.sum("c"), 6).alias("err"))


def rbp_at_k(
    run: DataFrame, qrels: DataFrame, k: int = 10, p: float = 0.8
) -> DataFrame:
    """(query_id, rbp, rbp_residual) — Rank-Biased Precision (Moffat &
    Zobel 2008): a user inspects rank r with persistence probability
    p^(r-1), so

        RBP = (1 - p) * sum_{r<=k} rel_r * p^(r-1)

    with binary relevance (rel > 0 counts, unjudged = 0). rbp_residual is
    the maximum the score could still gain from ranks below k — the
    truncation uncertainty the metric is designed to expose:
    residual = p^k (every deeper doc relevant). Per-query rows.

    Pure projection + one bounded groupBy over the (queries × k) run —
    the geometric weight is a closed form of the rank, no cumulative
    window needed."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    r = _ranked(run).where(F.col("rank") <= k)
    graded = r.join(qrels, ["query_id", "doc_id"], "left").select(
        "query_id",
        (
            F.when(F.coalesce(F.col("rel"), F.lit(0)) > 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
            * F.pow(F.lit(float(p)), F.col("rank").cast("double") - 1.0)
        ).alias("c"),
    )
    return graded.groupBy("query_id").agg(
        F.round(F.lit(1.0 - float(p)) * F.sum("c"), 6).alias("rbp"),
        F.round(F.lit(float(p) ** k), 6).alias("rbp_residual"),
    )


def map_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(map double, n_queries long) + per-query via map_at_k_per_query —
    Mean Average Precision at k with the trec_eval convention:

        AP@k(q) = (1/R) * sum_{r<=k, doc_r relevant} P@r
        P@r     = |relevant in top r| / r,  R = |qrels(q)| (ALL judged
                  relevant, not min(R, k) — trec_eval divides by R)

    Queries present in qrels but retrieving nothing relevant score 0 and
    still count in the macro average (same universe rule as mrr_at_k)."""
    return map_at_k_per_query(run, qrels, k=k).agg(
        F.avg("ap").alias("map"), F.count(F.lit(1)).alias("n_queries")
    )


def map_at_k_per_query(
    run: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """(query_id, ap) — see map_at_k. The precision-at-relevant-ranks sum
    is one rank-ordered cumulative window over the (queries × k)-bounded
    hit set; R is one qrels aggregate. Both are bounded, shuffle-light."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    r = _ranked(run).where(F.col("rank") <= k)
    hits = r.join(
        qrels.select("query_id", "doc_id").distinct(),
        ["query_id", "doc_id"],
        "left_semi",
    ).select("query_id", "rank")
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prec = hits.select(
        "query_id",
        (F.count(F.lit(1)).over(w) / F.col("rank")).alias("p_at_r"),
    )
    ap_sum = prec.groupBy("query_id").agg(F.sum("p_at_r").alias("_s"))
    total = qrels.groupBy("query_id").agg(F.count(F.lit(1)).alias("_r"))
    return total.join(ap_sum, "query_id", "left").select(
        "query_id",
        F.round(
            F.coalesce(F.col("_s"), F.lit(0.0)) / F.col("_r"), 6
        ).alias("ap"),
    )


def bpref(run: DataFrame, qrels: DataFrame, k: int | None = None) -> DataFrame:
    """One row (bpref double, n_queries long) — macro-average of
    bpref_per_query over queries with at least one judged-relevant doc
    (trec_eval skips R=0 queries)."""
    return bpref_per_query(run, qrels, k=k).agg(
        F.avg("bpref").alias("bpref"), F.count(F.lit(1)).alias("n_queries")
    )


def bpref_per_query(
    run: DataFrame, qrels: DataFrame, k: int | None = None
) -> DataFrame:
    """(query_id, bpref) — binary preference (Buckley & Voorhees 2004,
    trec_eval m_bpref convention). qrels must carry rel with EXPLICIT
    nonrelevant judgments (rel=0); unjudged retrieved docs are invisible
    to the measure (that is bpref's whole point — robustness to
    incomplete judgments):

        bpref = (1/R) * sum_{r rel retrieved} (1 - min(nr_above, R) / min(N, R))

    R/N = judged relevant/nonrelevant counts, nr_above = judged-
    NONRELEVANT docs retrieved ABOVE r. When min(N, R) = 0 each relevant
    retrieved contributes 1 (trec_eval's guard). k bounds the scored run
    depth (None = full run, trec_eval's default with its 1000-doc runs).

    Plan: one broadcast-joinable run × qrels equi join, one cumulative
    window per query, two bounded aggs — (queries × depth)-bounded
    throughout."""
    j = qrels.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("rel").cast("int").alias("rel"),
    )
    totals = j.groupBy("query_id").agg(
        F.sum((F.col("rel") >= 1).cast("int")).alias("R"),
        F.sum((F.col("rel") == 0).cast("int")).alias("N"),
    )
    r = _ranked(run)
    if k is not None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        r = r.where(F.col("rank") <= k)
    judged = r.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "rank",
    ).join(j, ["query_id", "doc_id"])
    from pyspark.sql import Window

    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = judged.withColumn(
        "_nr_above",
        F.coalesce(F.sum((F.col("rel") == 0).cast("int")).over(w), F.lit(0)),
    )
    contrib = (
        scored.where(F.col("rel") >= 1)
        .join(totals, "query_id")
        .select(
            "query_id",
            F.when(
                F.least(F.col("N"), F.col("R")) > 0,
                1.0 - F.least(F.col("_nr_above"), F.col("R"))
                / F.least(F.col("N"), F.col("R")),
            ).otherwise(F.lit(1.0)).alias("_c"),
        )
        .groupBy("query_id")
        .agg(F.sum("_c").alias("_s"))
    )
    return (
        totals.where(F.col("R") > 0)
        .join(contrib, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("_s"), F.lit(0.0)) / F.col("R"), 6
            ).alias("bpref"),
        )
    )


def r_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """One row (rprec double, n_queries long) — macro-averaged
    R-precision: precision at rank R where R is the query's judged-
    relevant count (trec_eval Rprec). Self-normalizing across queries
    with different R; only rel>=1 judgments participate."""
    j = qrels.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("rel").cast("int").alias("rel"),
    ).where(F.col("rel") >= 1)
    totals = j.groupBy("query_id").agg(F.count(F.lit(1)).alias("R"))
    r = _ranked(run).select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "rank",
    )
    hits = (
        r.join(totals, "query_id")
        .where(F.col("rank") <= F.col("R"))
        .join(j.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    per_q = totals.join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("_h"), F.lit(0)) / F.col("R")).alias("rprec_q"),
    )
    return per_q.agg(
        F.avg("rprec_q").alias("rprec"), F.count(F.lit(1)).alias("n_queries")
    )


def judged_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row (judged double, n_queries long) — mean fraction of the
    top-k that is judged at ALL (any rel, including explicit 0). The
    standard pool-coverage diagnostic: a low judged@k means the metrics
    above are being computed over holes. Universe = queries in qrels."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    j = qrels.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    ).distinct()
    r = _ranked(run).where(F.col("rank") <= k).select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    found = r.join(j, ["query_id", "doc_id"], "left_semi").groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_q = (
        j.select("query_id").distinct()
        .join(found, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("_n"), F.lit(0)) / F.lit(float(k))).alias("j_q"),
        )
    )
    return per_q.agg(
        F.avg("j_q").alias("judged"), F.count(F.lit(1)).alias("n_queries")
    )
