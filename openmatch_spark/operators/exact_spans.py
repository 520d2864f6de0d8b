"""Exact duplicate-SPAN removal — the substring-level dedup of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better" (ExactSubstr),
re-expressed for Spark.

Document-level dedup (operators/dedup.py) drops whole near-identical docs;
this operator removes REPEATED PASSAGES from otherwise-distinct docs — the
license boilerplate / navigation chrome / quoted-reply mass that survives
doc-level dedup because the surrounding text differs. Lee et al. build a
corpus-wide suffix array and delete any ≥50-token substring that appears
twice; a suffix array over 100 TB is a single-machine data structure, so the
Spark-sane equivalent is the fixed-length rolling window:

  1. per doc, every k-token window (positions 0..n-k) — one projection,
     corpus-token-proportional, the same shape as winnowing fingerprints
  2. one groupBy on the window key finds windows occurring in ≥ min_dup_docs
     distinct docs and elects the canonical occurrence: the corpus-global
     first, min (doc_id, position)
  3. every OTHER occurrence marks its token range [p, p+k) for removal;
     per doc the ranges union (overlapping duplicate windows merge
     naturally) and surviving tokens are re-joined

Any duplicated substring of length >= k yields at least one duplicated
k-window inside it, so coverage approaches ExactSubstr's as spans exceed k;
spans shorter than k are invisible (by design — k IS the minimum-match
length, Lee et al. use 50 BPE tokens).

Scale shape: stage 2 is ONE shuffle of (key, doc, pos) rows — linear in
corpus tokens; with hash_key=True (default) the key is a 64-bit xxhash of
the window text, so the shuffle carries 8-byte keys instead of k-token
strings (collisions at 64 bits are ~n²/2⁶⁵ — negligible false merges, and
only for removal, never a crash). The removal join ships occurrence rows
only; the per-doc rebuild is array algebra over the doc's own tokens (cost
n × dup-starts per doc, bounded by the doc's own window count). Nothing is
ever collected to the driver.

Whitespace contract: tokens are split on \\s+ and re-joined with single
spaces — cleaned docs are whitespace-normalized (same contract as the
reference's text cleanup, qa_utils.py whitespace fold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_dup_docs: int = 2,
    within_doc: bool = False,
    hash_key: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """(doc_id, text, n_tokens, n_removed): text with every non-canonical
    occurrence of a duplicated k-token span removed.

    min_dup_docs: a window is duplicated when it occurs in at least this
    many DISTINCT docs. within_doc=True additionally treats a window
    repeated inside one doc as duplicated (total occurrences >= 2) — off by
    default because in-doc repetition is quality-filter territory
    (textstats.repetition_signals), not cross-doc contamination.
    hash_key=False shuffles the raw window text instead of its 64-bit hash
    (exact, wider shuffle) — the contract-oracle mode.
    group_col scopes duplication: windows only count against occurrences
    in the SAME group (significant_text dedups each query's hit set
    independently — boilerplate shared across groups must not bleed);
    the group rides every key, so the plan shape is unchanged."""
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-token window would remove "
                         "every repeated word)")
    grp = [group_col] if group_col else []
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0)
    base = docs.select(
        *grp, F.col(doc_id_col).alias("_did"), toks.alias("_toks")
    )

    n = F.size("_toks")
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    win_txt = F.concat_ws(" ", F.slice("_toks", F.col("_p") + 1, k))
    occ = (
        base.select(*grp, "_did", "_toks", F.explode(starts).alias("_p"))
        .select(
            *grp,
            "_did",
            "_p",
            (F.xxhash64(win_txt) if hash_key else win_txt).alias("_key"),
        )
    )

    agg = [
        F.count(F.lit(1)).alias("_occ"),
        F.countDistinct("_did").alias("_ndocs"),
        # corpus-global first occurrence survives — deterministic under any
        # partitioning (min over a struct is total given unique (_did, _p))
        F.min(F.struct(F.col("_did"), F.col("_p"))).alias("_canon"),
    ]
    stats = occ.groupBy(*grp, "_key").agg(*agg)
    dup_cond = F.col("_ndocs") >= min_dup_docs
    if within_doc:
        dup_cond = dup_cond | (F.col("_occ") >= 2)
    dup = stats.where(dup_cond).select(*grp, "_key", "_canon")

    removals = (
        occ.join(dup, [*grp, "_key"])
        .where(
            ~(
                (F.col("_did") == F.col("_canon._did"))
                & (F.col("_p") == F.col("_canon._p"))
            )
        )
        .groupBy(*grp, "_did")
        .agg(F.sort_array(F.collect_list("_p")).alias("_starts"))
    )

    kept = F.when(
        F.col("_starts").isNull(), F.col("_toks")
    ).otherwise(
        F.filter(
            "_toks",
            lambda _x, i: ~F.exists(
                F.col("_starts"), lambda s: (i >= s) & (i < s + F.lit(k))
            ),
        )
    )
    return (
        base.join(removals, [*grp, "_did"], "left")
        .select(
            *grp,
            F.col("_did").alias(doc_id_col),
            F.concat_ws(" ", kept).alias(text_col),
            F.size("_toks").cast("int").alias("n_tokens"),
            (F.size("_toks") - F.size(kept)).cast("int").alias("n_removed"),
        )
    )


def duplicate_span_report(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_dup_docs: int = 2,
    hash_key: bool = True,
    top: int = 100,
) -> DataFrame:
    """Audit view: the `top` most-duplicated k-token spans
    (span text, n_docs, n_occurrences) — what a curation engineer eyeballs
    before choosing k. Keeps the span TEXT, so unlike the removal path this
    shuffles window strings; `top` bounds the result, not the shuffle."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0)
    base = docs.select(F.col(doc_id_col).alias("_did"), toks.alias("_toks"))
    n = F.size("_toks")
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    occ = base.select("_did", "_toks", F.explode(starts).alias("_p")).select(
        "_did", F.concat_ws(" ", F.slice("_toks", F.col("_p") + 1, k)).alias("span")
    )
    return (
        occ.groupBy("span")
        .agg(
            F.countDistinct("_did").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_dup_docs)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("span"))
        .limit(top)
    )
