"""Query-biased snippet extraction (the search-result preview surface).

For each (query, doc) hit pick the best fixed-width token window: the one
containing the most DISTINCT query terms, earliest window on ties; docs
with no query-term occurrence fall back to the document head (start 0,
n_hit_terms 0) — the behavior result pages actually want.

Correctness hinge: an optimal window can always be shifted right until its
START is a query-term occurrence without losing any contained occurrence
(there are none between the old start and the first occurrence), so only
occurrence positions need to be considered as candidate starts — which
makes the whole operator a bounded self-join instead of a per-doc scan.

Plan (pure column algebra, zero Python on the hot path):

  run ⋈ corpus ─► hydrated hits (bounded: queries × k rows)
      ─posexplode(terms) ⋈ broadcast query terms─► occurrences
      ─self-join on (query, doc) with pos ∈ [start, start+W)─►
      ─groupBy candidate start: countDistinct(term)─►
      ─window (nhit DESC, start ASC) rank 1─► chosen window
  run ─left join chosen─► slice(terms, start+1, W) ─array_join─► snippet

Scale: every stage is bounded by the run size (queries × k docs), not the
corpus; occurrence rows are run-docs × per-doc query-term hits, and the
self-join expands each occurrence by at most the window's occupancy. The
corpus join hydrates only the hit set (broadcast the run against the
corpus scan, the same shape hydrate_run uses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col, tokenize_py


def extract_snippets(
    corpus: DataFrame,
    run: DataFrame,
    queries: DataFrame,
    width: int = 16,
    analyzer: str = "simple",
) -> DataFrame:
    """(query_id, doc_id, start, n_hit_terms, snippet) for every run row.

    corpus: (doc_id, text); run: (query_id, doc_id); queries: (query_id,
    text). `start` is the 0-based token index of the chosen window,
    `snippet` the space-joined tokens [start, start+width)."""
    spark = run.sparkSession
    qrows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    qterms = sorted(
        {
            (str(r["query_id"]), t)
            for r in qrows
            for t in tokenize_py(r["text"], analyzer)
        }
    )
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    toks = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokenize_col(F.col("text"), analyzer).alias("terms"),
    )
    hydrated = toks.join(F.broadcast(base), "doc_id").select(
        "query_id", "doc_id", "terms"
    )
    if qterms:
        qt = F.broadcast(
            spark.createDataFrame(qterms, "query_id string, term string")
        )
        occ = (
            hydrated.select(
                "query_id", "doc_id", F.posexplode("terms").alias("pos", "term")
            )
            .join(qt, ["query_id", "term"])
            .select("query_id", "doc_id", "pos", "term")
        )
        a, b = occ.alias("a"), occ.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.query_id") == F.col("b.query_id"))
                & (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("b.pos") >= F.col("a.pos"))
                & (F.col("b.pos") < F.col("a.pos") + width),
            )
            .groupBy(
                F.col("a.query_id").alias("query_id"),
                F.col("a.doc_id").alias("doc_id"),
                F.col("a.pos").alias("start"),
            )
            .agg(F.countDistinct(F.col("b.term")).cast("int").alias("n_hit_terms"))
        )
        w = Window.partitionBy("query_id", "doc_id").orderBy(
            F.desc("n_hit_terms"), F.asc("start")
        )
        chosen = (
            cand.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("query_id", "doc_id", "start", "n_hit_terms")
        )
        hydrated = hydrated.join(chosen, ["query_id", "doc_id"], "left")
    else:
        hydrated = hydrated.withColumn("start", F.lit(None).cast("long")).withColumn(
            "n_hit_terms", F.lit(None).cast("int")
        )
    start = F.coalesce(F.col("start"), F.lit(0)).cast("long")
    return hydrated.select(
        "query_id",
        "doc_id",
        start.alias("start"),
        F.coalesce(F.col("n_hit_terms"), F.lit(0)).cast("int").alias("n_hit_terms"),
        F.array_join(
            F.slice(F.col("terms"), (start + 1).cast("int"), width), " "
        ).alias("snippet"),
    )


def highlight_fragments(
    corpus: DataFrame,
    run: DataFrame,
    queries: DataFrame,
    width: int = 16,
    n_fragments: int = 2,
    analyzer: str = "simple",
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """(query_id, doc_id, frag_idx, start, n_hit_terms, fragment) — the ES
    highlighter surface: up to n_fragments NON-OVERLAPPING query-biased
    windows per hit, best-first (distinct query-term hits DESC, start ASC),
    query terms wrapped in pre/post tags inside the fragment text.
    frag_idx is 1-based selection order. Unlike extract_snippets there is
    no doc-head fallback: a doc with zero query-term occurrences emits no
    fragments (ES omits non-matching fields from the highlight response).

    Greedy selection is unrolled into the plan (n_fragments is small):
    each round ranks the remaining candidates per (query, doc) — one
    window function — and an anti-overlap join (|start - picked| >= width
    against the rounds' picks so far) feeds the next round. All stages
    stay bounded by the run size × per-doc occurrence counts; the marking
    is a JVM transform() over the sliced token array, no UDF.
    """
    if n_fragments <= 0:
        raise ValueError(f"n_fragments must be positive, got {n_fragments}")
    spark = run.sparkSession
    qrows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    qterms = sorted(
        {
            (str(r["query_id"]), t)
            for r in qrows
            for t in tokenize_py(r["text"], analyzer)
        }
    )
    empty = spark.createDataFrame(
        [],
        "query_id string, doc_id string, frag_idx int, start long, "
        "n_hit_terms int, fragment string",
    )
    if not qterms:
        return empty
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    toks = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokenize_col(F.col("text"), analyzer).alias("terms"),
    )
    hydrated = toks.join(F.broadcast(base), "doc_id").select(
        "query_id", "doc_id", "terms"
    )
    qt = F.broadcast(
        spark.createDataFrame(qterms, "query_id string, term string")
    )
    occ = (
        hydrated.select(
            "query_id", "doc_id", F.posexplode("terms").alias("pos", "term")
        )
        .join(qt, ["query_id", "term"])
        .select("query_id", "doc_id", "pos", "term")
    )
    a, b = occ.alias("a"), occ.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") < F.col("a.pos") + width),
        )
        .groupBy(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("start"),
        )
        .agg(F.countDistinct(F.col("b.term")).cast("int").alias("n_hit_terms"))
    )
    w = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("n_hit_terms"), F.asc("start")
    )
    remaining = cand
    picks = None
    for i in range(1, n_fragments + 1):
        pick = (
            remaining.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(
                "query_id", "doc_id", "start", "n_hit_terms",
                F.lit(i).alias("frag_idx"),
            )
        )
        picks = pick if picks is None else picks.unionByName(pick)
        if i < n_fragments:
            p = pick.select(
                "query_id", "doc_id", F.col("start").alias("_pstart")
            )
            remaining = remaining.join(
                p, ["query_id", "doc_id"]
            ).where(
                F.abs(F.col("start") - F.col("_pstart")) >= width
            ).drop("_pstart")
    # per-query term array for the tag marking
    qarr = F.broadcast(
        qt.groupBy("query_id").agg(F.collect_set("term").alias("_qts"))
    )
    start1 = (F.col("start") + 1).cast("int")
    marked = F.array_join(
        F.transform(
            F.slice(F.col("terms"), start1, width),
            lambda t: F.when(
                F.array_contains(F.col("_qts"), t),
                F.concat(F.lit(pre_tag), t, F.lit(post_tag)),
            ).otherwise(t),
        ),
        " ",
    )
    return (
        picks.join(hydrated, ["query_id", "doc_id"])
        .join(qarr, "query_id")
        .select(
            "query_id",
            "doc_id",
            F.col("frag_idx").cast("int").alias("frag_idx"),
            F.col("start").cast("long").alias("start"),
            "n_hit_terms",
            marked.alias("fragment"),
        )
    )
