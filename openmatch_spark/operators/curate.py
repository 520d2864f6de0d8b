"""One-call training-data curation: language gate → quality gate → dedup.

The composition a web-scale pretraining pipeline actually runs over raw
documents, built from the engine's primitives (operators/textstats.py,
operators/dedup.py) so every stage inherits their scale properties: pure
column algebra for the gates (whole-stage codegen, no UDF), shuffle-bounded
LSH for near-dup (hot buckets capped). No reference counterpart (OpenMatch
consumes pre-curated corpora); semantics follow the C4/Gopher-style
filter-then-dedup recipe.

Gate precedence matters: documents failing the language or quality gate are
excluded BEFORE dedup, so junk can never become a duplicate group's
canonical representative and survive through it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.operators.dedup import deduplicate_corpus
from openmatch_spark.operators.textstats import pred_lang_col, quality_col


def curation_gates(langs: tuple[str, ...], min_quality: float):
    """(lang_ok, qual_ok) predicate columns over pred_lang/quality — THE
    single definition of the gates, shared by curate_corpus and
    curate_stream so the batch and streaming verdicts can never
    desynchronize. Null-safe: a NULL text yields NULL pred_lang/quality,
    and a NULL predicate fails BOTH where(g) and where(~g) — the row would
    vanish from every branch; coalescing to False gives NULL-text docs a
    deterministic drop."""
    lang_ok = F.coalesce(F.col("pred_lang").isin(list(langs)), F.lit(False))
    qual_ok = F.coalesce(
        F.col("quality") >= F.lit(float(min_quality)), F.lit(False)
    )
    return lang_ok, qual_ok


def curate_corpus(
    corpus: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
    url_col: str | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_min_overlap: int = 1,
    decontam_fuzzy_threshold: float | None = None,
) -> DataFrame:
    """(doc_id, keep, reason, dup_of): per-document curation verdict.

    reason: 'lang' | 'quality' | 'decontam' | 'url' | 'exact' | 'near' |
    'bucket' | NULL (kept); dup_of names the canonical doc for dedup drops,
    NULL otherwise. url_col adds the canonical-url dedup stage ahead of the
    content stages (deduplicate_corpus url_col).

    benchmark (optional, columns bench_id/text) adds the decontamination
    gate (operators/decontam.py) between the quality gate and dedup:
    eval-set overlap is removed BEFORE dedup so a contaminated doc can
    never become a duplicate group's surviving canonical.
    decontam_fuzzy_threshold (optional, with benchmark) ALSO drops docs
    whose shingle set is MinHash-near a benchmark doc at >= the given
    Jaccard — the paraphrase-level overlap the exact n-gram rule misses;
    both flavors report reason='decontam'.
    One verdict row per input row (doc_ids are expected unique upstream —
    duplicated ids flow through per-row rather than fanning out).
    """
    # gates are per-row projections, NOT joins: pred_lang/quality attach as
    # columns in one select, so the corpus text never shuffles for the
    # gates, rows with duplicate (or null) doc_ids can't fan out or vanish,
    # and both gate expressions live in the same codegen pass as the scan
    extra = [F.col(url_col).alias("_url")] if url_col is not None else []
    scored = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
        pred_lang_col(F.col(text_col)).alias("pred_lang"),
        quality_col(F.col(text_col)).alias("quality"),
        *extra,
    )

    lang_ok, qual_ok = curation_gates(langs, min_quality)

    lang_drops = scored.where(~lang_ok).select(
        "doc_id",
        F.lit(0).alias("keep"),
        F.lit("lang").alias("reason"),
        F.lit(None).cast("string").alias("dup_of"),
    )
    quality_drops = scored.where(lang_ok & ~qual_ok).select(
        "doc_id",
        F.lit(0).alias("keep"),
        F.lit("quality").alias("reason"),
        F.lit(None).cast("string").alias("dup_of"),
    )
    surv_cols = ["doc_id", "text"] + (["_url"] if url_col is not None else [])
    survivors = scored.where(lang_ok & qual_ok).select(*surv_cols)

    contam_drops = None
    if benchmark is not None:
        from openmatch_spark.operators.decontam import (
            decontaminate,
            decontaminate_fuzzy,
        )

        exact_flagged = (
            decontaminate(
                survivors, benchmark, n=decontam_n,
                min_overlap=decontam_min_overlap,
            )
            .where(F.col("is_contaminated"))
            .select(F.col("doc_id").alias("_contam_id"))
        )
        flagged = exact_flagged
        if decontam_fuzzy_threshold is not None:
            # the near-match half: paraphrase-level benchmark overlap that
            # no verbatim n-gram survives (operators/decontam.py)
            fuzzy_flagged = (
                decontaminate_fuzzy(
                    survivors, benchmark,
                    n=shingle_n, num_hashes=num_hashes, num_bands=num_bands,
                    threshold=decontam_fuzzy_threshold,
                )
                .where(F.col("contaminated"))
                .select(F.col("doc_id").alias("_contam_id"))
            )
            flagged = flagged.unionByName(fuzzy_flagged).distinct()
        contam_drops = survivors.join(
            flagged, survivors["doc_id"] == flagged["_contam_id"], "left_semi"
        ).select(
            "doc_id",
            F.lit(0).alias("keep"),
            F.lit("decontam").alias("reason"),
            F.lit(None).cast("string").alias("dup_of"),
        )
        survivors = survivors.join(
            flagged, survivors["doc_id"] == flagged["_contam_id"], "left_anti"
        )

    deduped = deduplicate_corpus(
        survivors,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        num_bands=num_bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket=max_bucket,
        url_col="_url" if url_col is not None else None,
    ).select("doc_id", F.col("keep").cast("int").alias("keep"), "reason", "dup_of")

    out = lang_drops.unionByName(quality_drops)
    if contam_drops is not None:
        out = out.unionByName(contam_drops)
    return out.unionByName(deduped)


def curate_stream(
    pages: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    watermark: str = "24 hours",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    url_col: str | None = None,
) -> DataFrame:
    """Streaming curation: the SAME language and quality gates as
    curate_corpus (stateless column projections, so they apply to a
    streaming DataFrame unchanged — one codegen pass, no state), followed
    by watermark-bounded exact dedup among the survivors
    (streaming/events.py:streaming_exact_dedup — state keyed on the
    content hash, expired by the watermark).

    Emits the KEPT rows (the cleaned stream a sink or the incremental
    indexer consumes), with pred_lang/quality/content_hash attached.
    Near-dup (LSH) needs corpus-wide signature state and intentionally
    stays batch-side: run deduplicate_corpus over the accumulated corpus
    at compaction cadence — the same split Lucene-style ingest pipelines
    use. Works identically on a batch DataFrame (same expressions; the
    dedup stage then picks the deterministic earliest-(ts,url) survivor).
    """
    from openmatch_spark.streaming.events import streaming_exact_dedup

    scored = pages.withColumn(
        "pred_lang", pred_lang_col(F.col(text_col))
    ).withColumn("quality", quality_col(F.col(text_col)))
    lang_ok, qual_ok = curation_gates(langs, min_quality)
    gated = scored.where(lang_ok & qual_ok)
    return streaming_exact_dedup(
        gated, watermark=watermark, ts_col=ts_col, text_col=text_col,
        url_col=url_col,
    )
