"""Benchmark decontamination: flag training docs that overlap an eval set.

LLM training corpora must be scrubbed of evaluation-benchmark text before
training, or downstream scores are meaningless (GPT-3 Appendix C introduced
the 13-gram overlap rule; Dolma/OLMo and Llama use the same shape with n in
8..13). The reference repo has no decontamination stage — this operator
extends the engine's training-data-pipeline family (same family as
operators/dedup.py / operators/curate.py) with the published heuristic,
re-expressed as Spark column algebra.

Semantics
---------
A corpus document is *contaminated* when it shares >= ``min_overlap``
distinct word n-grams with ANY benchmark document (tokenization =
``analysis.tokenize_col``, the same normalization the dedup family uses, so
case/punctuation differences don't hide overlap).

Scale shape (the 100 TB story)
------------------------------
Benchmarks are small by nature (an eval set is MBs, the corpus is TBs), so
the benchmark side is exploded to distinct (bench_id, n-gram) rows and
**broadcast**; the corpus side never shuffles its text:

- per-doc distinct n-grams are a pure projection (``array_distinct`` over a
  ``transform``/``slice`` fold — no explode+distinct shuffle),
- the overlap join is a broadcast hash join on the exploded grams,
- the only exchange is the groupBy(doc_id) over MATCHED rows — in a clean
  corpus that is a tiny fraction of the input — plus the final left join
  back to the slim (doc_id, total) projection, which AQE turns into a
  broadcast join whenever the matched side is small.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from openmatch_spark.analysis import tokenize_col

__all__ = ["ngram_array_col", "decontaminate", "decontaminate_corpus", "decontaminate_fuzzy"]


def ngram_array_col(text: Column, n: int, analyzer: str = "simple") -> Column:
    """Distinct word n-grams of ``text`` as an array column (projection-only;
    same slice/concat construction as operators/dedup.py shingles, minus the
    explode)."""
    toks = tokenize_col(text, analyzer)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    analyzer: str = "simple",
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns one row per corpus doc:
      (doc_id, total_ngrams, contaminated_ngrams, contamination_ratio,
       n_benchmark_docs, is_contaminated)

    ``total_ngrams`` counts the doc's DISTINCT n-grams; ``contaminated_ngrams``
    counts those that appear in any benchmark doc; ``n_benchmark_docs`` counts
    the distinct benchmark docs hit. ``is_contaminated`` is the
    >= min_overlap verdict (GPT-3 C.1 uses min_overlap=1 at n=13; Dolma uses
    a ratio threshold — both are expressible from these columns).
    """
    docs = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        ngram_array_col(F.col(text_col), n, analyzer).alias("grams"),
    )
    totals = docs.select("doc_id", F.size("grams").cast("long").alias("total_ngrams"))

    bench = F.broadcast(
        benchmark.select(
            F.col(bench_id_col).cast("string").alias("bench_id"),
            F.explode(
                ngram_array_col(F.col(bench_text_col), n, analyzer)
            ).alias("gram"),
        )
    )

    matched = (
        docs.select("doc_id", F.explode("grams").alias("gram"))
        .join(bench, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("contaminated_ngrams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )

    return (
        totals.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "total_ngrams",
            F.coalesce("contaminated_ngrams", F.lit(0)).cast("long").alias("contaminated_ngrams"),
            F.round(
                F.coalesce("contaminated_ngrams", F.lit(0))
                / F.greatest(F.col("total_ngrams"), F.lit(1)).cast("double"),
                6,
            ).alias("contamination_ratio"),
            F.coalesce("n_benchmark_docs", F.lit(0)).cast("long").alias("n_benchmark_docs"),
            (F.coalesce("contaminated_ngrams", F.lit(0)) >= min_overlap).alias("is_contaminated"),
        )
    )


def decontaminate_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    analyzer: str = "simple",
) -> DataFrame:
    """The filtering twin: corpus rows (original columns) with contaminated
    docs removed. Anti-join against the verdicts, so the corpus text itself
    is never shuffled — only its (doc_id) key column."""
    flagged = (
        decontaminate(
            corpus, benchmark, n=n, min_overlap=min_overlap,
            id_col=id_col, text_col=text_col,
            bench_id_col=bench_id_col, bench_text_col=bench_text_col,
            analyzer=analyzer,
        )
        .where(F.col("is_contaminated"))
        .select(F.col("doc_id").alias("__contam_id"))
    )
    return corpus.join(
        flagged,
        F.col(id_col).cast("string") == F.col("__contam_id"),
        "left_anti",
    )


def decontaminate_fuzzy(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    threshold: float = 0.5,
    analyzer: str = "simple",
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_candidates, best_bench_id, best_jaccard, contaminated) —
    the FUZZY half of decontamination (Dolma-style paragraph-level near
    match): a training doc is contaminated when its shingle set is
    near-identical (Jaccard >= threshold) to ANY benchmark doc, caught by
    MinHash-LSH banding even when no single long n-gram survives verbatim
    (the exact ``decontaminate`` rule's blind spot under light paraphrase
    or tokenizer-splitting edits).

    Reuses the dedup family's portable md5 MinHash (operators/dedup.py) so
    the oracle can replay the hashing bit-for-bit. Scale shape: the
    benchmark is small by nature, so its band table BROADCASTS; the corpus
    pays its signature aggregate (the same shuffle the dedup pipeline
    already prices) and only LSH candidates reach the exact-Jaccard
    verify. best_jaccard is rounded BEFORE the best-candidate pick
    (bench_id ASC tie-break) so the verdict is engine-reproducible."""
    from openmatch_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
        shingles,
    )

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    c_sh = shingles(corpus, n, corpus_id, text_col, analyzer)
    b_sh = shingles(benchmark, n, bench_id, text_col, analyzer).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    c_bands = minhash_bands(
        minhash_signatures(c_sh, num_hashes), num_bands, num_hashes
    )
    b_bands = minhash_bands(
        minhash_signatures(
            b_sh.select(F.col("bench_id").alias("doc_id"), "shingle"), num_hashes
        ),
        num_bands,
        num_hashes,
    ).select(F.col("doc_id").alias("bench_id"), "band", "band_hash")
    cands = (
        c_bands.join(F.broadcast(b_bands), ["band", "band_hash"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    n_c = c_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    n_b = b_sh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        cands.join(c_sh, "doc_id")
        .join(b_sh, ["bench_id", "shingle"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        common.join(n_c, "doc_id")
        .join(F.broadcast(n_b), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                round_to,
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), F.asc("bench_id"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "doc_id",
            F.col("bench_id").alias("best_bench_id"),
            F.col("jaccard").alias("best_jaccard"),
        )
    )
    counts = cands.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    all_docs = corpus.select(
        F.col(corpus_id).cast("string").alias("doc_id")
    ).distinct()
    return (
        all_docs.join(counts, "doc_id", "left")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            "best_bench_id",
            "best_jaccard",
            F.coalesce(
                F.col("best_jaccard") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )
