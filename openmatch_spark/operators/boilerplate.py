"""Cross-document line-level boilerplate removal (CCNet / RefinedWeb style).

Web text carries navigation chrome, cookie banners, and footer text that
repeats verbatim across many pages of a site; per-document dedup never sees
it because each *document* is unique. The standard fix (Wenzek et al. CCNet
§4.1 paragraph dedup; Penedo et al. RefinedWeb "line-wise corrections")
removes any line whose normalized form appears in at least ``min_docs``
distinct documents. The reference repo has no curation stage at all; this
extends the engine's pipeline family alongside `operators/curate.py`.

Scale shape (100 TB): three stages, each bounded —
1. explode lines (projection, no shuffle), aggregate distinct-doc counts by
   normalized line key — ONE shuffle on the line key with partial
   aggregation;
2. the surviving boilerplate-line set is tiny relative to the corpus (only
   lines repeated across >= min_docs docs), so the removal join is
   AQE-broadcastable; worst case it degrades to a shuffle join on the same
   key the lines already carry;
3. rebuild each document — ONE shuffle on doc_id; per-task state is bounded
   by the largest single document (same bound as tokenization itself).

Determinism: output depends only on (text, min_docs, min_line_chars),
never on partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["boilerplate_lines", "remove_boilerplate_lines"]


def _exploded(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per line: (doc_id, _isnull, pos, line, k). Null-text docs
    survive as a single (pos NULL, line NULL) row so they round-trip."""
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).isNull().alias("_isnull"),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("k", F.trim(F.col("line")))


def boilerplate_lines(
    corpus: DataFrame,
    min_docs: int = 2,
    min_line_chars: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(line, n_docs): normalized non-empty lines of >= ``min_line_chars``
    chars that occur in >= ``min_docs`` distinct documents — the
    boilerplate audit table. Duplicates *within* one document do not count
    toward ``n_docs`` (a doc-internal refrain is repetition_signals'
    business, not boilerplate)."""
    lines = _exploded(corpus, id_col, text_col)
    return (
        lines.where(
            (F.col("k") != "") & (F.length("k") >= min_line_chars)
        )
        .groupBy(F.col("k").alias("line"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    corpus: DataFrame,
    min_docs: int = 2,
    min_line_chars: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, n_lines, n_removed): each document with its
    boilerplate lines dropped (order of surviving lines preserved).

    A line is removed iff its trimmed form is non-empty, at least
    ``min_line_chars`` chars, and appears in >= ``min_docs`` distinct docs.
    Lines below the eligibility bar (blank separators, very short lines)
    are always kept — they carry structure, not boilerplate. NULL text
    stays NULL; a doc whose every line is boilerplate becomes ''.
    """
    lines = _exploded(corpus, id_col, text_col)
    common = boilerplate_lines(
        corpus, min_docs=min_docs, min_line_chars=min_line_chars,
        id_col=id_col, text_col=text_col,
    ).select(F.col("line").alias("k"), F.lit(True).alias("_bp"))

    flagged = lines.join(common, "k", "left").withColumn(
        "_drop", F.coalesce(F.col("_bp"), F.lit(False))
    )
    # collect_list skips NULL elements, so the conditional struct keeps
    # only surviving lines; array_sort on (pos, line) restores doc order.
    kept_struct = F.when(~F.col("_drop"), F.struct("pos", "line"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.first("_isnull").alias("_isnull"),
            F.count("line").alias("n_lines"),
            F.coalesce(
                F.sum(F.col("_drop").cast("long")), F.lit(0)
            ).alias("n_removed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            ).alias("_text"),
        )
        .select(
            "doc_id",
            F.when(F.col("_isnull"), F.lit(None).cast("string"))
            .otherwise(F.col("_text"))
            .alias("text"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_removed").cast("long").alias("n_removed"),
        )
    )
