"""Lucene/ES `intervals` query — the deterministic compositional core.

Scope (documented subset of Lucene's minimal-interval algebra,
org.apache.lucene.queries.intervals / ES intervals query): the root is
one `all_of` over m slots; each slot is a single analyzed term or an
`any_of` over alternative terms (Intervals.or of term sources). Two
root modes:

  ordered   — Intervals.ordered: one position per slot, strictly
              increasing across slots; the matched window is the
              tightest such embedding and gaps = window - m must be
              <= max_gaps (Lucene's maxgaps filter; max_gaps < 0 means
              unlimited, the ES default).
  unordered — Intervals.unordered: one position per slot in ANY order;
              window is the tightest cover, same gaps rule. Slots must
              have pairwise-disjoint alternative sets here (one token
              position can satisfy only one slot; Lucene resolves
              overlapping same-term slots with interval minimization,
              which this subset deliberately excludes — raising beats
              silently returning its answer).

Nested composition (all_of inside any_of, containing/not_containing
filters, phrase leaves) is out of scope — each is a bolt-on to the same
two kernels but has no oracle-replicable closed form at this size.

An OOV alternative inside a slot contributes nothing; a slot whose
every alternative is OOV makes the query unmatchable (Lucene: a missing
term source matches no intervals) — it returns zero rows, structurally.

Scoring: BM25 over the spec's distinct terms with qtf = number of
slots listing the term — the same weight algebra as `search()` and the
span family (Lucene's IntervalQuery scores by interval frequency
instead; keeping BM25 keeps the whole pipeline on the verified
weights). Ranked by score; window and gaps are reported per hit.

Plan: both modes ride the phrase module's machinery — ONE pruned scan
of the positional sidecar for the union of all live terms, one shuffle
into per-(query, doc) groups, then either the pure-JVM ordered-DP fold
(`_min_window_grouped`, O(n*m) per doc) or the sorted min-cover sweep;
the scorer join reuses the postings table. Slot alternatives add
occurrence ROWS, not stages: any_of is free at plan level.

Reference semantics: Lucene IntervalsSource ordered/unordered +
maxgaps; ES docs "intervals query". No reference-repo counterpart
(OpenMatch has no positional queries) — engine-specific surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.index.load import BM25Index
from openmatch_spark.functions.localrel import inline_table
from openmatch_spark.query.phrase import (
    _bm25_scores,
    _finalize,
    _min_cover_grouped,
    _min_window_grouped,
    _pruned_positions,
)

_EMPTY = (
    "query_id string, doc_id string, score double, rank int, "
    "window int, gaps int"
)


def _normalize_specs(specs: list[dict], analyzer: str):
    """-> {qid: (slots: list[list[term]], ordered: bool, max_gaps: int)}
    with every alternative analyzed to exactly one token."""
    from openmatch_spark.analysis import tokenize_py

    norm: dict[str, tuple[list[list[str]], bool, int]] = {}
    for spec in specs:
        qid = str(spec["query_id"])
        if qid in norm:
            raise ValueError(f"duplicate query_id {qid!r}")
        raw = spec.get("slots")
        if not raw:
            raise ValueError(f"{qid}: slots must be a non-empty list")
        ordered = bool(spec.get("ordered", True))
        max_gaps = int(spec.get("max_gaps", -1))
        slots: list[list[str]] = []
        for j, alts in enumerate(raw):
            if isinstance(alts, str):
                alts = [alts]
            if not alts:
                raise ValueError(f"{qid}: slot {j} has no alternatives")
            terms = []
            for a in alts:
                toks = tokenize_py(a, analyzer)
                if len(toks) != 1:
                    raise ValueError(
                        f"{qid}: slot {j} alternative {a!r} analyzes to "
                        f"{len(toks)} tokens; intervals slots take single "
                        "terms (phrase leaves are out of scope)"
                    )
                terms.append(toks[0])
            slots.append(sorted(set(terms)))
        if not ordered:
            seen: set[str] = set()
            for alts in slots:
                dup = seen.intersection(alts)
                if dup:
                    raise ValueError(
                        f"{qid}: unordered slots share alternatives "
                        f"{sorted(dup)}; this subset requires disjoint "
                        "slot vocabularies (see module docstring)"
                    )
                seen.update(alts)
        norm[qid] = (slots, ordered, max_gaps)
    return norm


def search_intervals(
    index: BM25Index, specs: list[dict], k: int = 100
) -> DataFrame:
    """Top-k intervals search. specs: one dict per query —
    {"query_id": str, "slots": [term | [alt, ...], ...],
     "ordered": bool = True, "max_gaps": int = -1 (unlimited)}.

    Returns (query_id, doc_id, score, rank, window, gaps) where window
    is the tightest matching cover in tokens and gaps = window - m."""
    spark = index.spark
    empty = spark.createDataFrame([], _EMPTY)
    norm = _normalize_specs(specs, index.stats["analyzer"])

    all_terms = sorted({t for s, _, _ in norm.values() for a in s for t in a})
    bucket_of = index.term_buckets(all_terms)
    live: dict[str, tuple[list[list[str]], bool, int]] = {}
    for qid, (slots, ordered, max_gaps) in sorted(norm.items()):
        kept = [[t for t in alts if t in bucket_of] for alts in slots]
        if all(kept):  # every slot retains at least one alternative
            live[qid] = (kept, ordered, max_gaps)
    if not live:
        return empty

    terms = sorted({t for s, _, _ in live.values() for a in s for t in a})
    occ = _pruned_positions(index, terms, bucket_of)
    meta = F.broadcast(
        inline_table(spark, 
            [(q, len(s), mg) for q, (s, _, mg) in sorted(live.items())],
            "query_id string, m int, max_gaps int",
        )
    )

    parts: list[DataFrame] = []
    ordered_rows = [
        (q, t, j, len(slots))
        for q, (slots, is_ord, _) in sorted(live.items()) if is_ord
        for j, alts in enumerate(slots)
        for t in alts
    ]
    if ordered_rows:
        slot_df = F.broadcast(
            inline_table(spark, 
                ordered_rows, "query_id string, term string, j int, m int"
            )
        )
        parts.append(
            _min_window_grouped(occ.join(slot_df, "term")).withColumnRenamed(
                "min_window", "window"
            )
        )
    unord_rows = [
        (q, t, j, len(slots))
        for q, (slots, is_ord, _) in sorted(live.items()) if not is_ord
        for j, alts in enumerate(slots)
        for t in alts
    ]
    if unord_rows:
        pair_df = F.broadcast(
            inline_table(spark, 
                unord_rows, "query_id string, term string, j int, m int"
            )
        )
        # coverage is keyed on the SLOT id so each slot (not each term)
        # must be covered; disjointness (enforced above) makes this exact
        parts.append(
            _min_cover_grouped(occ.join(pair_df, "term")).withColumnRenamed(
                "min_cover", "window"
            )
        )

    hits = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    gated = (
        hits.join(meta, "query_id")
        .withColumn("gaps", (F.col("window") - F.col("m")).cast("int"))
        .where((F.col("max_gaps") < 0) | (F.col("gaps") <= F.col("max_gaps")))
    )

    qterms = [
        (q, t, float(sum(t in alts for alts in slots)))
        for q, (slots, _, _) in sorted(live.items())
        for t in sorted({x for alts in slots for x in alts})
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = gated.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "window", "gaps"
    )
    return _finalize(index, cand, k, ["window", "gaps"])
