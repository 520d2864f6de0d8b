"""ES phrase suggester: whole-phrase did-you-mean over a noisy-channel
model — per-position candidate corrections from the corpus vocabulary
(DirectSpellChecker gates, same as query/spell.py) recombined into
candidate phrases and ranked by a stupid-backoff bigram language model
times an edit-distance channel prior.

Model (documented precisely because the DuckDB oracle replays it
bit-for-bit):

  log10 score(c_1..c_P) = log10 P_uni(c_1) + channel(c_1)
                        + sum_{i>1} [ log10 P_sb(c_i | c_{i-1})
                                      + channel(c_i) ]

  P_uni(w)       = (count(w) + alpha) / (N + alpha * V)
                   (alpha=0.5 Lidstone floor so out-of-vocabulary
                   originals keep a finite score)
  P_sb(w | v)    = count(v w) / count(v)        if the bigram was seen
                   discount * P_uni(w)          otherwise
                   (discount=0.4 — ES's default stupid_backoff)
  channel(c)     = log10(rwel)                  for the unchanged token
                   edits * log10(1 - rwel)      for a correction
                   (rwel = real_word_error_likelihood, ES default 0.95)

Deviations from ES, stated: ES scores against the index's shingle
field and prunes combinations with a beam; this scores against unigram
/ bigram tables built from the raw corpus in one tokenize pass and
enumerates combinations exactly, bounded by
(num_candidates + 1) ** max positions — exhaustive equals beam output
at these bounds and keeps the surface oracle-replicable (a recursive
CTE can replay exact enumeration; it cannot replay a beam). ES's
`confidence` cutoff and collation probe are not implemented.

Scale shape: the LM tables are one corpus tokenize + two map-side
combined groupBys (the same plan as term_stats); everything per-query
is bounded by queries x candidates^positions, joined distributed —
nothing corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from openmatch_spark.functions.localrel import inline_table

_TOKEN_SPLIT = "[^a-z0-9]+"


def _simple_tokens(col):
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def suggest_phrases(
    docs: DataFrame,
    queries: DataFrame,
    max_edits: int = 1,
    prefix_len: int = 1,
    num_candidates: int = 3,
    n_suggest: int = 3,
    real_word_error_likelihood: float = 0.95,
    discount: float = 0.4,
    alpha: float = 0.5,
    max_positions: int = 8,
) -> DataFrame:
    """(query_id, suggestion, score, rank) — top corrected phrases per
    query, score the log10 noisy-channel value above, rank by
    (score DESC, suggestion ASC). Queries tokenizing to nothing emit no
    rows; queries longer than max_positions raise (the combination
    space is exponential in positions — callers chunk long texts).
    """
    if max_edits < 1:
        raise ValueError(f"max_edits must be >= 1, got {max_edits}")
    if not 0.0 < real_word_error_likelihood < 1.0:
        raise ValueError(
            "real_word_error_likelihood must be in (0, 1), got "
            f"{real_word_error_likelihood}"
        )
    if not 0.0 < discount <= 1.0:
        raise ValueError(f"discount must be in (0, 1], got {discount}")
    spark = docs.sparkSession

    toks = docs.select(_simple_tokens(F.col("text")).alias("toks")).where(
        F.size("toks") > 0
    )
    uni = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .persist()
    )
    tot = uni.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    ).collect()[0]
    n_tokens, vocab = float(tot["n"] or 0.0), float(tot["v"] or 0.0)
    denom = n_tokens + alpha * vocab
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("double").alias("bcnt"))
        .persist()
    )

    # queries are eval-batch bounded: tokenize driver-side (the
    # suggest_spelling pattern) to get per-position rows + lengths
    import re

    qtok_rows, qlen = [], {}
    for r in queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect():
        ts = [t for t in re.split(_TOKEN_SPLIT, (r["text"] or "").lower())
              if t]
        if not ts:
            continue
        if len(ts) > max_positions:
            raise ValueError(
                f"query {r['query_id']!r} has {len(ts)} tokens; "
                f"max_positions={max_positions} bounds the combination "
                "space — chunk longer texts"
            )
        qlen[r["query_id"]] = len(ts)
        qtok_rows += [(r["query_id"], i + 1, t) for i, t in enumerate(ts)]
    empty = spark.createDataFrame(
        [], "query_id string, suggestion string, score double, rank int"
    )
    if not qtok_rows:
        return empty
    qt = inline_table(spark, 
        qtok_rows, "query_id string, pos int, token string"
    )
    typed = F.broadcast(
        inline_table(spark, 
            sorted({(t,) for _, _, t in qtok_rows}), "token string"
        )
    )

    # per-token candidates: the token itself (edits=0) + top corrections
    # under the DirectSpellChecker gates/order shared with spell.py
    corr = uni.join(
        typed,
        (F.substring("term", 1, prefix_len)
         == F.substring("token", 1, prefix_len))
        & (F.col("term") != F.col("token"))
        & (F.length("term") >= F.length("token") - max_edits)
        & (F.length("term") <= F.length("token") + max_edits)
        & (F.levenshtein("term", "token") <= max_edits),
    ).withColumn("edits", F.levenshtein("term", "token").cast("int"))
    cw = Window.partitionBy("token").orderBy(
        F.asc("edits"), F.desc("cnt"), F.asc("term")
    )
    corr = (
        corr.withColumn("_r", F.row_number().over(cw))
        .where(F.col("_r") <= num_candidates)
        .select("token", F.col("term").alias("cand"), "edits", "cnt")
    )
    self_cand = typed.join(uni, F.col("token") == F.col("term"), "left").select(
        "token",
        F.col("token").alias("cand"),
        F.lit(0).cast("int").alias("edits"),
        F.coalesce("cnt", F.lit(0.0)).alias("cnt"),
    )
    chan = F.when(
        F.col("edits") == 0,
        F.lit(math.log10(real_word_error_likelihood)),
    ).otherwise(
        F.col("edits")
        * F.lit(math.log10(1.0 - real_word_error_likelihood))
    )
    cands = (
        qt.join(self_cand.unionByName(corr), "token")
        .select("query_id", "pos", "cand", "cnt", chan.alias("chan"))
        .persist()
    )

    def p_uni(cnt_col):
        return (cnt_col + F.lit(alpha)) / F.lit(denom)

    # both LM lookups the recombination loop needs are bounded by the
    # candidate set, never the corpus: slice once, broadcast every step
    cand_terms = cands.select(F.col("cand").alias("w1")).distinct()
    bi_slice = (
        bi.join(F.broadcast(cand_terms), "w1", "left_semi")
        .join(
            F.broadcast(cand_terms.select(F.col("w1").alias("w2"))),
            "w2", "left_semi",
        )
        .persist()
    )
    prev_cnt = uni.select(
        F.col("term").alias("prev"), F.col("cnt").alias("_pcnt")
    ).join(
        cands.select(F.col("cand").alias("prev")).distinct(),
        "prev", "left_semi",
    ).persist()

    partial = cands.where(F.col("pos") == 1).select(
        "query_id",
        F.col("cand").alias("phrase"),
        F.col("cand").alias("prev"),
        (F.log10(p_uni(F.col("cnt"))) + F.col("chan")).alias("ls"),
    )
    max_p = max(qlen.values())
    finished = []
    for p in range(1, max_p + 1):
        done_qids = sorted(q for q, ln in qlen.items() if ln == p)
        if done_qids:
            finished.append(
                partial.where(F.col("query_id").isin(done_qids)).select(
                    "query_id", "phrase", "ls"
                )
            )
        if p == max_p:
            break
        step = cands.where(F.col("pos") == p + 1).select(
            "query_id",
            F.col("cand").alias("_c"),
            F.col("cnt").alias("_ccnt"),
            F.col("chan").alias("_chan"),
        )
        ext = (
            partial.join(step, "query_id")
            .join(F.broadcast(prev_cnt), "prev", "left")
            .join(
                F.broadcast(
                    bi_slice.select(
                        F.col("w1").alias("prev"),
                        F.col("w2").alias("_c"),
                        "bcnt",
                    )
                ),
                ["prev", "_c"], "left",
            )
        )
        p_sb = F.when(
            F.col("bcnt").isNotNull(), F.col("bcnt") / F.col("_pcnt")
        ).otherwise(F.lit(discount) * p_uni(F.col("_ccnt")))
        partial = ext.select(
            "query_id",
            F.concat_ws(" ", "phrase", "_c").alias("phrase"),
            F.col("_c").alias("prev"),
            (F.col("ls") + F.log10(p_sb) + F.col("_chan")).alias("ls"),
        )
    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("ls"), F.asc("phrase")
    )
    return (
        out.withColumn("rank", F.row_number().over(rw).cast("int"))
        .where(F.col("rank") <= n_suggest)
        .select(
            "query_id",
            F.col("phrase").alias("suggestion"),
            F.col("ls").alias("score"),
            "rank",
        )
    )
