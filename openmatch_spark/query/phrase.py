"""Phrase and proximity search over the positional sidecar.

Semantics (Lucene PhraseQuery / sloppy-span analog, fixed here):
  * phrase   — all phrase tokens occur CONSECUTIVELY in order; phrase_freq
               counts the occurrences. A phrase token missing from the
               vocabulary makes the phrase unmatchable (zero hits).
  * proximity — every distinct query term occurs inside SOME token window
               of width <= `within`; min_cover reports the tightest window.
  * score    — BM25 over the phrase/query terms with qtf multiplicity,
               identical weighting to `search()`; hits are ranked by it.
               (Lucene's exact PhraseQuery scores on phrase_freq instead —
               that variant is one expression swap; BM25-over-terms keeps
               the whole pipeline on the already-verified weight algebra.)

Phrase plan (declarative, no driver loops over docs):

  positions ─bucket+term-pruned scan─► rows for the phrase's terms only
            ─mapInArrow decode─► (shard, term, doc_ord, pos)
            ─broadcast join (term, phrase offset)─► adj = pos - off
            ─groupBy (query, shard, doc, adj): all offsets present?─►
                 phrase occurrences ─groupBy doc─► phrase_freq
  postings  ─same pruned scan─► BM25 scores per (query, doc)  [scorer join]
  candidates ⋈ scores ─window top-k─ docmap broadcast join ─► run

The decode explodes Σ cf(term) occurrence rows for the QUERIED terms only
— the inherent cost of positional match, bounded by the pruned scan, and
shuffled exactly once into the occurrence groupBy. The scoring side reuses
the postings table (never the sidecar).

Proximity plan: same decoded rows, then the classic minimal-cover sweep
as a PURE-JVM aggregate fold (_min_cover_grouped — same shape as the
ordered DP below): one shuffle into per-(query, doc) sorted occurrence
arrays, O(n·t) fold with O(t) state (t = #slots), no Python anywhere.
Slots generalize distinct terms so the intervals query (query/
intervals.py) shares the kernel with per-slot alternatives.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.index.compact import _decode_blocks_arrow
from openmatch_spark.index.load import BM25Index
from openmatch_spark.index.positions import _decode_positions_arrow
from openmatch_spark.query.bm25_search import _DISTRIBUTED_TOKENIZE_MIN_QUERIES
from openmatch_spark.functions.localrel import in_list, inline_table

_DECODED_POSTINGS = (
    "shard int, term string, term_bucket int, doc_ord long, weight double"
)
_DECODED_POSITIONS = "shard int, term string, doc_ord long, pos long"


def _pruned_positions(index: BM25Index, terms: list[str], bucket_of: dict):
    buckets = sorted({bucket_of[t] for t in terms})
    return (
        index.positions.where(
            in_list("term_bucket", buckets) & in_list("term", terms)
        )
        .select("shard", "term", "doc_ord", "positions")
        .mapInArrow(_decode_positions_arrow, _DECODED_POSITIONS)
    )


def _bm25_scores(index: BM25Index, qterms: list, bucket_of: dict):
    """(query_id, shard, doc_ord, score): BM25 over [(qid, term, qtf)]."""
    spark = index.spark
    terms = sorted({t for (_, t, _) in qterms})
    buckets = sorted({bucket_of[t] for t in terms})
    decoded = (
        index.postings.where(
            in_list("term_bucket", buckets) & in_list("term", terms)
        )
        .mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
    )
    qt = F.broadcast(
        inline_table(spark, qterms, "query_id string, term string, qtf double")
    )
    return (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.sum(F.col("weight") * F.col("qtf")).alias("score"))
    )


def _finalize(index: BM25Index, cand: DataFrame, k: int, extra: list[str]) -> DataFrame:
    """candidates (query_id, shard, doc_ord, score, *extra) -> ranked run.
    Tombstoned docs (index/deletes.py) are masked before the rank cut."""
    cand = index.mask_deleted(cand)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"))
    cut = cand.withColumn("_r", F.rank().over(w)).where(F.col("_r") <= k).drop("_r")
    hits = index.docmap.select("shard", "doc_ord", "doc_id").join(
        F.broadcast(cut), ["shard", "doc_ord"]
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank", *extra)
    )


def _search_phrase_distributed(index: BM25Index, q: DataFrame, k: int) -> DataFrame:
    """Executor-side phrase path for big batches: query text never crosses
    the driver — offsets come from a posexplode of the tokenizer column,
    and only the DISTINCT TERM set (vocabulary-bounded) is collected to
    plan the pruned scans. A phrase with an OOV token dies structurally:
    plen counts ALL tokens pre-vocabulary while matched offsets come from
    the positions join, so countDistinct(off) can never reach plen."""
    from openmatch_spark.analysis import tokenize_col

    analyzer = index.stats["analyzer"]
    toks = q.select(
        "query_id",
        F.posexplode(tokenize_col(F.col("text"), analyzer)).alias("off", "term"),
    ).withColumn("off", F.col("off").cast("long"))
    toks.persist()
    plen = toks.groupBy("query_id").agg(F.count(F.lit(1)).alias("plen"))
    terms = sorted(r["term"] for r in toks.select("term").distinct().collect())
    bucket_of = index.term_buckets(terms)
    in_vocab = sorted(t for t in terms if t in bucket_of)
    if not in_vocab:
        toks.unpersist()
        return index.spark.createDataFrame(
            [], "query_id string, doc_id string, score double, rank int, phrase_freq int"
        )
    occ = _pruned_positions(index, in_vocab, bucket_of)
    freq = (
        occ.join(toks, "term")
        .groupBy(
            "query_id", "shard", "doc_ord",
            (F.col("pos") - F.col("off")).alias("adj"),
        )
        .agg(F.countDistinct("off").alias("n_off"))
        .join(plen, "query_id")
        .where(F.col("n_off") == F.col("plen"))
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.count(F.lit(1)).cast("int").alias("phrase_freq"))
    )
    qt = toks.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )
    decoded = index.postings.where(
        in_list("term_bucket", sorted({bucket_of[t] for t in in_vocab}))
        & in_list("term", in_vocab)
    ).mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
    scores = (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.sum(F.col("weight") * F.col("qtf")).alias("score"))
    )
    cand = freq.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "phrase_freq"
    )
    return _finalize(index, cand, k, ["phrase_freq"])


def search_phrase(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """Exact-phrase top-k: (query_id, doc_id, score, rank, phrase_freq).

    queries: (query_id, text) — text is the phrase, tokenized by the index
    analyzer; token order and duplicates are significant. Batches above
    distributed_threshold tokenize executor-side (identical results)."""
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, phrase_freq int"
    )
    base = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    )
    rows = base.take(distributed_threshold + 1)
    if len(rows) > distributed_threshold:
        return _search_phrase_distributed(index, base, k)
    phrases = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in rows}
    phrases = {q: toks for q, toks in phrases.items() if toks}
    if not phrases:
        return empty
    all_terms = sorted({t for toks in phrases.values() for t in toks})
    bucket_of = index.term_buckets(all_terms)
    # an OOV token anywhere in the phrase makes it unmatchable
    live = {q: toks for q, toks in phrases.items() if all(t in bucket_of for t in toks)}
    if not live:
        return empty

    offsets = [
        (q, t, off) for q, toks in sorted(live.items()) for off, t in enumerate(toks)
    ]
    plens = [(q, len(toks)) for q, toks in sorted(live.items())]
    terms = sorted({t for (_, t, _) in offsets})
    occ = _pruned_positions(index, terms, bucket_of)
    off_df = F.broadcast(
        inline_table(index.spark, offsets, "query_id string, term string, off long")
    )
    plen_df = F.broadcast(
        inline_table(index.spark, plens, "query_id string, plen long")
    )
    # an occurrence of the phrase starting at token adj exists iff every
    # phrase offset contributes a row with the same adj = pos - off
    freq = (
        occ.join(off_df, "term")
        .groupBy("query_id", "shard", "doc_ord", (F.col("pos") - F.col("off")).alias("adj"))
        .agg(F.countDistinct("off").alias("n_off"))
        .join(plen_df, "query_id")
        .where(F.col("n_off") == F.col("plen"))
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.count(F.lit(1)).cast("int").alias("phrase_freq"))
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(live.items())
        for t, c in sorted(Counter(toks).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = freq.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "phrase_freq"
    )
    return _finalize(index, cand, k, ["phrase_freq"])



def _min_cover_grouped(rows: DataFrame) -> DataFrame:
    """(query_id, shard, doc_ord, min_cover) from slot-labeled occurrence
    rows (query_id, shard, doc_ord, pos, j, m) — the classic minimal-
    cover sweep as a PURE-JVM aggregate fold (same rationale as
    _min_window_grouped: dispatching queries × hit-docs of tiny groups
    through a pandas kernel costs ~100x the arithmetic; measured 33s ->
    ~3s on the intervals bench leg).

    One shuffle builds the per-(query, doc) pos-sorted occurrence array;
    one aggregate() walk keeps latest[j] = the slot's most recent
    position — once every slot has one, the tightest window ending here
    is pos - min(latest) + 1. O(n*m) work, O(m) state, no Python. A doc
    missing any slot never fills latest, so best stays sentinel and the
    doc drops — the all-slots-present gate, structurally."""
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pos").alias("pos"), F.col("j").cast("int").alias("j")
            )
        )
    )
    g = rows.groupBy("query_id", "shard", "doc_ord").agg(
        F.max("m").cast("int").alias("m"), arr.alias("_occ")
    )
    init = F.struct(
        F.array_repeat(F.lit(-1).cast("long"), F.col("m")).alias("latest"),
        F.lit(_SENTINEL).cast("long").alias("best"),
    )

    def merge(acc, x):
        latest = F.transform(
            acc["latest"],
            lambda v, i: F.when(i == x["j"], x["pos"]).otherwise(v),
        )
        mn = F.array_min(latest)
        best = F.when(
            mn >= 0, F.least(acc["best"], x["pos"] - mn + 1)
        ).otherwise(acc["best"])
        return F.struct(latest.alias("latest"), best.alias("best"))

    cover = F.aggregate(
        F.col("_occ"),
        init,
        merge,
        lambda acc: F.when(
            acc["best"] < F.lit(_SENTINEL), acc["best"]
        ).cast("int"),
    )
    return g.select(
        "query_id", "shard", "doc_ord", cover.alias("min_cover")
    ).where(F.col("min_cover").isNotNull())


def _search_proximity_distributed(
    index: BM25Index, q: DataFrame, within: int, k: int
) -> DataFrame:
    """Executor-side proximity path for big batches (mirrors the phrase
    variant): n_terms counts DISTINCT query terms PRE-vocabulary, so the
    cover kernel's all-terms-present check kills OOV queries structurally."""
    from openmatch_spark.analysis import tokenize_col

    analyzer = index.stats["analyzer"]
    xtok = q.select(
        "query_id", F.explode(tokenize_col(F.col("text"), analyzer)).alias("term")
    )
    xtok.persist()
    pairs = xtok.distinct()
    nt = pairs.groupBy("query_id").agg(
        F.countDistinct("term").cast("int").alias("n_terms")
    )
    terms = sorted(r["term"] for r in pairs.select("term").distinct().collect())
    bucket_of = index.term_buckets(terms)
    in_vocab = sorted(t for t in terms if t in bucket_of)
    if not in_vocab:
        xtok.unpersist()
        return index.spark.createDataFrame(
            [], "query_id string, doc_id string, score double, rank int, min_cover int"
        )
    occ = _pruned_positions(index, in_vocab, bucket_of)
    # slot ids number ALL distinct terms PRE-vocabulary: an OOV term's
    # slot never receives occurrence rows, so the fold's all-slots gate
    # kills the query structurally (same rule the pandas kernel enforced
    # via its n_terms check)
    wslot = Window.partitionBy("query_id").orderBy("term")
    slots = pairs.join(nt, "query_id").select(
        "query_id", "term",
        (F.row_number().over(wslot) - 1).cast("int").alias("j"),
        F.col("n_terms").alias("m"),
    )
    grouped = _min_cover_grouped(occ.join(slots, "term")).where(
        F.col("min_cover") <= within
    )
    qt = xtok.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )
    decoded = index.postings.where(
        in_list("term_bucket", sorted({bucket_of[t] for t in in_vocab}))
        & in_list("term", in_vocab)
    ).mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
    scores = (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.sum(F.col("weight") * F.col("qtf")).alias("score"))
    )
    cand = grouped.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "min_cover"
    )
    return _finalize(index, cand, k, ["min_cover"])


def search_proximity(
    index: BM25Index,
    queries: DataFrame,
    within: int,
    k: int = 100,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """Unordered proximity top-k: docs where every distinct query term
    occurs inside some window of <= `within` tokens. Returns
    (query_id, doc_id, score, rank, min_cover). Batches above
    distributed_threshold tokenize executor-side (identical results)."""
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, min_cover int"
    )
    base = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    )
    rows = base.take(distributed_threshold + 1)
    if len(rows) > distributed_threshold:
        return _search_proximity_distributed(index, base, within, k)
    qtoks = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in rows}
    qtoks = {q: toks for q, toks in qtoks.items() if toks}
    if not qtoks:
        return empty
    all_terms = sorted({t for toks in qtoks.values() for t in toks})
    bucket_of = index.term_buckets(all_terms)
    live = {
        q: toks for q, toks in qtoks.items() if all(t in bucket_of for t in toks)
    }
    if not live:
        return empty

    slot_rows = [
        (q, t, j, len(set(toks)))
        for q, toks in sorted(live.items())
        for j, t in enumerate(sorted(set(toks)))
    ]
    terms = sorted({t for (_, t, _, _) in slot_rows})
    occ = _pruned_positions(index, terms, bucket_of)
    slots_df = F.broadcast(
        inline_table(spark, 
            slot_rows, "query_id string, term string, j int, m int"
        )
    )
    grouped = _min_cover_grouped(occ.join(slots_df, "term")).where(
        F.col("min_cover") <= within
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(live.items())
        for t, c in sorted(Counter(toks).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = grouped.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "min_cover"
    )
    return _finalize(index, cand, k, ["min_cover"])


# ---------------------------------------------------------------------------
# Ordered proximity — Lucene SpanNearQuery(in_order=true) / ES span_near
# ---------------------------------------------------------------------------

_SENTINEL = 1 << 62


def _min_window_grouped(rows: DataFrame) -> DataFrame:
    """(query_id, shard, doc_ord, min_window) from (query_id, shard,
    doc_ord, pos, j, m) occurrence×slot rows — the minimum-window-
    subsequence DP as a PURE-JVM aggregate fold (no Python groups: the
    per-doc occurrence lists are tiny but there are queries × hit-docs of
    them, and dispatching each through a pandas kernel costs ~100× the
    arithmetic — measured 83s → ~3s on the bench's 50-query batch).

    One shuffle builds the per-(query, doc) sorted occurrence array
    (collect_list + array_sort: pos ASC, then slot DESC so an occurrence
    can't chain with itself); one aggregate() fold walks it keeping
    dp[j] = max start position over embeddings of seq[0..j] whose last
    element sits strictly before the current position — max start <=> min
    width for a window ending here. O(n·m) work, O(m) state, all inside
    the JVM.
    """
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pos").alias("pos"),
                (-F.col("j")).cast("long").alias("negj"),
                F.col("j").cast("int").alias("j"),
            )
        )
    )
    g = rows.groupBy("query_id", "shard", "doc_ord").agg(
        F.max("m").cast("int").alias("m"), arr.alias("_occ")
    )
    m = F.col("m")
    init = F.struct(
        F.array_repeat(F.lit(-1).cast("long"), m).alias("dp"),
        F.lit(_SENTINEL).cast("long").alias("best"),
    )

    def merge(acc, x):
        # dp[slot] lives at element_at(dp, slot+1); slot j's start chains
        # from dp[j-1] = element_at(dp, j). greatest() guards the j=0 read
        # (the branch never uses it, but element_at(_, 0) is an error).
        prev = F.element_at(acc["dp"], F.greatest(x["j"], F.lit(1)))
        start = F.when(x["j"] == 0, x["pos"]).otherwise(prev)
        valid = (x["j"] == 0) | (prev >= 0)
        new_dp = F.transform(
            acc["dp"],
            lambda v, i: F.when(
                (i == x["j"]) & valid, F.greatest(v, start)
            ).otherwise(v),
        )
        new_best = F.when(
            valid & (x["j"] == m - 1),
            F.least(acc["best"], x["pos"] - start + 1),
        ).otherwise(acc["best"])
        return F.struct(new_dp.alias("dp"), new_best.alias("best"))

    win = F.aggregate(
        F.col("_occ"),
        init,
        merge,
        lambda acc: F.when(
            acc["best"] < F.lit(_SENTINEL), acc["best"]
        ).cast("int"),
    )
    return g.select(
        "query_id", "shard", "doc_ord", win.alias("min_window")
    ).where(F.col("min_window").isNotNull())


def _search_span_near_distributed(
    index: BM25Index, q: DataFrame, within: int, k: int
) -> DataFrame:
    """Executor-side span-near path for big batches: the slot table
    (query, term, slot, m) is built by posexplode — never on the driver;
    an OOV token simply never contributes occurrence rows, so the DP
    can't fill its slot and the query dies structurally (Lucene: a
    missing span clause matches nothing)."""
    from openmatch_spark.analysis import tokenize_col

    analyzer = index.stats["analyzer"]
    toks = q.select(
        "query_id", tokenize_col(F.col("text"), analyzer).alias("toks")
    )
    toks.persist()
    slots = toks.select(
        "query_id",
        F.size("toks").alias("m"),
        F.posexplode("toks").alias("j", "term"),
    )
    terms = sorted(
        r["term"] for r in slots.select("term").distinct().collect()
    )
    bucket_of = index.term_buckets(terms)
    in_vocab = sorted(t for t in terms if t in bucket_of)
    if not in_vocab:
        toks.unpersist()
        return index.spark.createDataFrame(
            [], "query_id string, doc_id string, score double, rank int, min_window int"
        )
    occ = _pruned_positions(index, in_vocab, bucket_of)
    grouped = _min_window_grouped(occ.join(slots, "term")).where(
        F.col("min_window") <= within
    )
    qt = slots.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )
    decoded = index.postings.where(
        in_list("term_bucket", sorted({bucket_of[t] for t in in_vocab}))
        & in_list("term", in_vocab)
    ).mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
    scores = (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.sum(F.col("weight") * F.col("qtf")).alias("score"))
    )
    cand = grouped.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "min_window"
    )
    return _finalize(index, cand, k, ["min_window"])


def search_span_near(
    index: BM25Index,
    queries: DataFrame,
    within: int,
    k: int = 100,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """Ordered proximity top-k — Lucene SpanNearQuery(in_order=true):
    docs where the query's token sequence occurs in order (strictly
    increasing positions) inside some window of <= `within` tokens;
    min_window reports the tightest such window (>= the sequence length;
    Lucene's slop = within - len(sequence)). Duplicate query tokens each
    require their own occurrence. Scored like search_proximity: BM25 over
    the query terms with qtf multiplicity, ranked by score.

    Returns (query_id, doc_id, score, rank, min_window). Batches above
    distributed_threshold tokenize executor-side (identical results).

    Plan: identical shape to search_proximity — pruned positional-sidecar
    scan, ONE shuffle into per-(query, doc) sorted occurrence arrays, the
    O(n·m) DP as a JVM aggregate() fold (no Python anywhere) — plus the
    postings-side scorer join. Order checking adds no extra exchange.
    """
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, min_window int"
    )
    base = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    )
    rows = base.take(distributed_threshold + 1)
    if len(rows) > distributed_threshold:
        return _search_span_near_distributed(index, base, within, k)
    qtoks = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in rows}
    qtoks = {q: toks for q, toks in qtoks.items() if toks}
    if not qtoks:
        return empty
    all_terms = sorted({t for toks in qtoks.values() for t in toks})
    bucket_of = index.term_buckets(all_terms)
    # an OOV token anywhere in the sequence makes it unmatchable
    live = {
        q: toks for q, toks in qtoks.items() if all(t in bucket_of for t in toks)
    }
    if not live:
        return empty

    slot_rows = [
        (q, t, j, len(toks))
        for q, toks in sorted(live.items())
        for j, t in enumerate(toks)
    ]
    terms = sorted({t for (_, t, _, _) in slot_rows})
    occ = _pruned_positions(index, terms, bucket_of)
    slots_df = F.broadcast(
        inline_table(spark, 
            slot_rows, "query_id string, term string, j int, m int"
        )
    )
    grouped = _min_window_grouped(occ.join(slots_df, "term")).where(
        F.col("min_window") <= within
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(live.items())
        for t, c in sorted(Counter(toks).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = grouped.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "min_window"
    )
    return _finalize(index, cand, k, ["min_window"])


def search_phrase_prefix(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    max_expansions: int = 50,
) -> DataFrame:
    """Lucene MatchPhrasePrefixQuery: every token but the last matches
    exactly and consecutively; the LAST token matches as a PREFIX of any
    vocabulary term ("spark str" hits "spark stream", "spark strategy").
    (query_id, doc_id, score, rank, phrase_freq).

    Expansion: the prefix expands to <= max_expansions vocabulary terms
    capped by (df DESC, term ASC) — the engine's shared multi-term cap
    rule (query/expand.py), a total order, deliberately NOT Lucene's
    term-dictionary-order cap so the surface stays oracle-replicable;
    both orders are "first N of an explosion guard", neither is ranked.
    An occurrence at start s needs every exact offset present at
    adj = pos - off AND some expansion at the final offset. Unmatchable
    whole-query cases (OOV exact token, zero expansions) return no rows.

    Scoring: BM25 over the EXACT tokens with qtf multiplicity — the
    prefix gates the match but doesn't perturb the verified weight
    algebra (Lucene blends expansions as synonyms; documented deviation,
    same convention as search_phrase's BM25-over-terms). Hence >= 2
    tokens required: a pure-prefix query is search_prefix's job.

    Plan: ONE pruned positional scan over exact ∪ expansion terms (the
    occurrence rows ride a single decode), one broadcast of the per-query
    (term, off, is_exp) table, one occurrence groupBy, and the standard
    pruned-postings scorer join — the phrase plan plus a flag column.
    Driver-tokenized (search-box surface); big batches follow
    search_phrase's distributed pattern if ever needed."""
    from openmatch_spark.analysis import tokenize_py
    from openmatch_spark.query.expand import _expansions

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, phrase_freq int"
    )
    rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    phrases = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in rows}
    short = sorted(q for q, toks in phrases.items() if 0 < len(toks) < 2)
    if short:
        raise ValueError(
            f"phrase_prefix needs >= 2 tokens (got 1 for {short[:3]}); "
            "a single-prefix query is search_prefix"
        )
    phrases = {q: toks for q, toks in phrases.items() if toks}
    if not phrases:
        return empty
    exact_vocab = index.term_buckets(
        sorted({t for toks in phrases.values() for t in toks[:-1]})
    )
    live = {
        q: toks for q, toks in phrases.items()
        if all(t in exact_vocab for t in toks[:-1])
    }
    if not live:
        return empty
    prefixes = sorted({toks[-1] for toks in live.values()})
    by_prefix = _expansions(index, prefixes, "prefix", 0, 0, max_expansions)
    live = {q: toks for q, toks in live.items() if by_prefix.get(toks[-1])}
    if not live:
        return empty

    combined = []  # (qid, term, off, is_exp)
    for q, toks in sorted(live.items()):
        last = len(toks) - 1
        for off, t in enumerate(toks[:-1]):
            combined.append((q, t, off, 0))
        for term, _, _ in by_prefix[toks[-1]]:
            combined.append((q, term, last, 1))
    bucket_of = dict(exact_vocab)
    for exps in by_prefix.values():
        for term, _, bucket in exps:
            bucket_of[term] = bucket
    all_terms = sorted({t for (_, t, _, _) in combined})
    occ = _pruned_positions(index, all_terms, bucket_of)
    comb_df = F.broadcast(
        inline_table(spark, 
            combined, "query_id string, term string, off long, is_exp int"
        )
    )
    plen_df = F.broadcast(
        inline_table(spark, 
            [(q, len(toks) - 1) for q, toks in sorted(live.items())],
            "query_id string, n_exact long",
        )
    )
    # occurrence at adj: all exact offsets present AND an expansion at the
    # final slot; two expansion variants at the same slot count one
    # occurrence (max flag), matching Lucene's synonym-position semantics
    freq = (
        occ.join(comb_df, "term")
        .groupBy(
            "query_id", "shard", "doc_ord",
            (F.col("pos") - F.col("off")).alias("adj"),
        )
        .agg(
            F.countDistinct(
                F.when(F.col("is_exp") == 0, F.col("off"))
            ).alias("n_ex"),
            F.max("is_exp").alias("has_exp"),
        )
        .join(plen_df, "query_id")
        .where((F.col("n_ex") == F.col("n_exact")) & (F.col("has_exp") == 1))
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.count(F.lit(1)).cast("int").alias("phrase_freq"))
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(live.items())
        for t, c in sorted(Counter(toks[:-1]).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = freq.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "phrase_freq"
    )
    return _finalize(index, cand, k, ["phrase_freq"])


def search_span_first(
    index: BM25Index,
    queries: DataFrame,
    end: int,
    k: int = 100,
) -> DataFrame:
    """Lucene SpanFirstQuery: docs where SOME query token occurs at a
    position < `end` (token offsets 0-based — Lucene's "within the first
    `end` positions"; title/lead-paragraph matching over a body index).
    (query_id, doc_id, score, rank, first_pos) — first_pos is the earliest
    qualifying occurrence of any query term. Scored BM25 over the query
    terms with qtf multiplicity (the engine's span-family convention);
    OOV-only queries structurally return nothing.

    Plan: the pruned positional scan filtered to pos < end BEFORE the
    groupBy — the position predicate rides the decode, so state is
    bounded by matches in the head window, not doc length."""
    from openmatch_spark.analysis import tokenize_py

    if end <= 0:
        raise ValueError(f"end must be positive, got {end}")
    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, first_pos int"
    )
    rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    qtoks = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in rows}
    qtoks = {q: toks for q, toks in qtoks.items() if toks}
    if not qtoks:
        return empty
    all_terms = sorted({t for toks in qtoks.values() for t in toks})
    bucket_of = index.term_buckets(all_terms)
    live = {
        q: [t for t in toks if t in bucket_of]
        for q, toks in qtoks.items()
    }
    live = {q: ts for q, ts in live.items() if ts}
    if not live:
        return empty
    pairs = sorted({(q, t) for q, ts in live.items() for t in ts})
    terms = sorted({t for (_, t) in pairs})
    occ = _pruned_positions(index, terms, bucket_of).where(F.col("pos") < end)
    qt_df = F.broadcast(
        inline_table(spark, pairs, "query_id string, term string")
    )
    firsts = (
        occ.join(qt_df, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.min("pos").cast("int").alias("first_pos"))
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(qtoks.items())
        for t, c in sorted(Counter([t for t in toks if t in bucket_of]).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = firsts.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "first_pos"
    )
    return _finalize(index, cand, k, ["first_pos"])


def search_span_not(
    index: BM25Index,
    queries: DataFrame,
    exclude: DataFrame,
    pre: int = 0,
    post: int = 0,
    k: int = 100,
) -> DataFrame:
    """Lucene SpanNotQuery over single-term spans: occurrences of the
    include query's tokens SURVIVE unless an exclude token occurs within
    [pos - pre, pos + post]; docs with >= 1 surviving occurrence match
    ("java" but not preceded by "free" — negation at the OCCURRENCE level,
    not the doc level like must_not). queries/exclude: (query_id, text),
    matched on query_id; a query with no exclude row keeps all
    occurrences. (query_id, doc_id, score, rank, kept_occurrences).

    Scored BM25 over the include terms with qtf multiplicity. The
    include-x-exclude proximity test is a per-(query, doc) position join —
    bounded by the two terms' occurrence counts in that doc (the inherent
    cost of occurrence-level negation; same shape as the phrase adj join,
    one shuffle)."""
    from openmatch_spark.analysis import tokenize_py

    if pre < 0 or post < 0:
        raise ValueError("pre and post must be >= 0")
    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [],
        "query_id string, doc_id string, score double, rank int, "
        "kept_occurrences int",
    )
    inc_rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    exc_rows = exclude.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    inc = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in inc_rows}
    inc = {q: toks for q, toks in inc.items() if toks}
    exc = {str(r["query_id"]): tokenize_py(r["text"], analyzer) for r in exc_rows}
    if not inc:
        return empty
    all_terms = sorted(
        {t for toks in inc.values() for t in toks}
        | {t for toks in exc.values() for t in toks}
    )
    bucket_of = index.term_buckets(all_terms)
    live_inc = sorted({
        (q, t) for q, toks in inc.items() for t in toks if t in bucket_of
    })
    if not live_inc:
        return empty
    live_exc = sorted({
        (q, t) for q, toks in exc.items() for t in toks
        if t in bucket_of and q in inc
    })
    terms = sorted({t for (_, t) in live_inc} | {t for (_, t) in live_exc})
    occ = _pruned_positions(index, terms, bucket_of)
    inc_df = F.broadcast(
        inline_table(spark, live_inc, "query_id string, term string")
    )
    iocc = occ.join(inc_df, "term").select(
        "query_id", "shard", "doc_ord", F.col("pos").alias("ipos")
    )
    if live_exc:
        exc_df = F.broadcast(
            inline_table(spark, live_exc, "query_id string, term string")
        )
        eocc = occ.join(exc_df, "term").select(
            "query_id", "shard", "doc_ord", F.col("pos").alias("epos")
        )
        clash = (
            iocc.join(eocc, ["query_id", "shard", "doc_ord"])
            .where(
                (F.col("epos") >= F.col("ipos") - F.lit(pre))
                & (F.col("epos") <= F.col("ipos") + F.lit(post))
            )
            .select("query_id", "shard", "doc_ord", "ipos")
            .distinct()
        )
        survivors = iocc.join(
            clash, ["query_id", "shard", "doc_ord", "ipos"], "left_anti"
        )
    else:
        survivors = iocc
    kept = survivors.groupBy("query_id", "shard", "doc_ord").agg(
        F.count(F.lit(1)).cast("int").alias("kept_occurrences")
    )
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(inc.items())
        for t, c in sorted(
            Counter([t for t in toks if t in bucket_of]).items()
        )
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = kept.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "kept_occurrences"
    )
    return _finalize(index, cand, k, ["kept_occurrences"])


def _phrase_starts(index: BM25Index, keyed: dict, bucket_of: dict) -> DataFrame:
    """{composite_key: token tuple} -> (ck, shard, doc_ord, start): every
    occurrence start of each exact phrase, via the offset-adjacency trick
    (all offsets agree on one start) over ONE pruned positional scan —
    the per-clause machinery search_phrase/_phrase_matches use, exposed
    for the span-containment surfaces."""
    spark = index.spark
    offsets = [
        (ck, t, off)
        for ck, toks in sorted(keyed.items())
        for off, t in enumerate(toks)
    ]
    plens = [(ck, len(toks)) for ck, toks in sorted(keyed.items())]
    terms = sorted({t for (_, t, _) in offsets})
    occ = _pruned_positions(index, terms, bucket_of)
    off_df = F.broadcast(
        inline_table(spark, offsets, "ck string, term string, off long")
    )
    plen_df = F.broadcast(
        inline_table(spark, plens, "ck string, plen long")
    )
    return (
        occ.join(off_df, "term")
        .groupBy(
            "ck", "shard", "doc_ord",
            (F.col("pos") - F.col("off")).alias("start"),
        )
        .agg(F.countDistinct("off").alias("n_off"))
        .join(plen_df, "ck")
        .where(F.col("n_off") == F.col("plen"))
        .select("ck", "shard", "doc_ord", "start")
    )


_SPAN_SEP = "\x1f"


def _span_containment(
    index: BM25Index, queries: DataFrame, k: int, mode: str
) -> DataFrame:
    """Shared engine for search_span_containing / search_span_within.

    queries: (query_id, big, little) — both exact phrases (analyzed,
    order + adjacency significant). A BIG span is each occurrence of the
    big phrase ([start, start + len_big - 1]); a LITTLE span likewise.
    mode 'containing' keeps big spans that contain some little span and
    ranks by BM25 over the BIG phrase's terms; mode 'within' keeps little
    spans inside some big span and ranks by the LITTLE phrase's terms —
    Lucene's SpanContainingQuery / SpanWithinQuery, whose result spans
    (and hence scoring terms) differ exactly this way. n_spans counts the
    distinct qualifying spans. An OOV token in either phrase makes the
    query unmatchable (structural, like every span surface).

    Plan: one pruned positional scan resolves BOTH phrase families'
    occurrence starts (the adjacency groupBy), one (query, doc)-keyed
    join pairs them — fan-out bounded by per-doc phrase frequencies —
    and the scoring pass is the standard pruned postings decode."""
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, n_spans int"
    )
    rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "big", "little"
    ).collect()
    per_q = {
        str(r["query_id"]): (
            tuple(tokenize_py(r["big"] or "", analyzer)),
            tuple(tokenize_py(r["little"] or "", analyzer)),
        )
        for r in rows
    }
    per_q = {q: (b, l) for q, (b, l) in per_q.items() if b and l}
    if not per_q:
        return empty
    all_terms = sorted({t for (b, l) in per_q.values() for t in (*b, *l)})
    bucket_of = index.term_buckets(all_terms)
    live = {
        q: (b, l)
        for q, (b, l) in per_q.items()
        if all(t in bucket_of for t in (*b, *l))
    }
    if not live:
        return empty
    keyed = {}
    for q, (b, l) in sorted(live.items()):
        keyed[f"{q}{_SPAN_SEP}B"] = b
        keyed[f"{q}{_SPAN_SEP}L"] = l
    starts = _phrase_starts(index, keyed, bucket_of)
    qid = F.split(F.col("ck"), _SPAN_SEP)[0]
    role = F.split(F.col("ck"), _SPAN_SEP)[1]
    blen = F.broadcast(inline_table(spark, 
        [(q, len(b), len(l)) for q, (b, l) in sorted(live.items())],
        "query_id string, blen long, llen long",
    ))
    spans = starts.select(
        qid.alias("query_id"), role.alias("role"), "shard", "doc_ord", "start"
    ).join(blen, "query_id")
    bigs = spans.where(F.col("role") == "B").select(
        "query_id", "shard", "doc_ord",
        F.col("start").alias("b0"),
        (F.col("start") + F.col("blen") - 1).alias("b1"),
    )
    littles = spans.where(F.col("role") == "L").select(
        "query_id", "shard", "doc_ord",
        F.col("start").alias("l0"),
        (F.col("start") + F.col("llen") - 1).alias("l1"),
    )
    paired = bigs.join(littles, ["query_id", "shard", "doc_ord"]).where(
        (F.col("b0") <= F.col("l0")) & (F.col("l1") <= F.col("b1"))
    )
    span_col = "b0" if mode == "containing" else "l0"
    counted = (
        paired.select("query_id", "shard", "doc_ord", span_col)
        .distinct()
        .groupBy("query_id", "shard", "doc_ord")
        .agg(F.count(F.lit(1)).cast("int").alias("n_spans"))
    )
    gov = 0 if mode == "containing" else 1
    qterms = [
        (q, t, float(c))
        for q, toks in sorted(live.items())
        for t, c in sorted(Counter(toks[gov]).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = counted.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "n_spans"
    )
    return _finalize(index, cand, k, ["n_spans"])


def search_span_containing(
    index: BM25Index, queries: DataFrame, k: int = 100
) -> DataFrame:
    """Lucene SpanContainingQuery over exact-phrase spans: docs where an
    occurrence of the `big` phrase CONTAINS an occurrence of the `little`
    phrase; ranked BM25 over the big phrase's terms. queries: (query_id,
    big, little). (query_id, doc_id, score, rank, n_spans) — n_spans =
    distinct qualifying big spans."""
    return _span_containment(index, queries, k, "containing")


def search_span_within(
    index: BM25Index, queries: DataFrame, k: int = 100
) -> DataFrame:
    """Lucene SpanWithinQuery over exact-phrase spans: docs where an
    occurrence of the `little` phrase lies WITHIN an occurrence of the
    `big` phrase; ranked BM25 over the little phrase's terms. queries:
    (query_id, big, little). n_spans = distinct qualifying little
    spans."""
    return _span_containment(index, queries, k, "within")


def search_span_or(
    index: BM25Index, queries: DataFrame, k: int = 100
) -> DataFrame:
    """Lucene SpanOrQuery over exact-phrase spans: docs where ANY of the
    alternative phrases occurs. queries: (query_id, alternatives) with
    alternatives an array<string> of phrase texts (a single-token
    alternative is a 1-length span — SpanTermQuery). (query_id, doc_id,
    score, rank, n_spans) — n_spans counts DISTINCT matched spans, i.e.
    distinct (start, end) pairs across alternatives (SpanOr merges its
    sub-spans; two alternatives matching the same positions contribute
    one span, alternatives of different lengths starting at the same
    position are distinct spans).

    Scoring: the engine's span-family convention — BM25 over the UNION of
    the LIVE alternatives' constituent terms, qtf = the term's total
    count across those alternatives (similarity stats over the combined
    term set, mirroring how SpanOrQuery builds its SpanWeight from all
    sub-queries' terms). An alternative with an OOV token is structurally
    unmatchable and drops ALONE — the query stays live through its other
    alternatives (unlike span_near, where one dead slot kills the query);
    a query whose alternatives ALL die returns nothing.

    Plan: one pruned positional scan resolves every alternative's
    occurrence starts via the shared offset-adjacency groupBy
    (_phrase_starts); the span union is a distinct over (query, doc,
    start, end); scoring is the standard pruned postings decode. No
    per-row Python anywhere."""
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int, n_spans int"
    )
    rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "alternatives"
    ).collect()
    per_q: dict = {}
    for r in rows:
        alts = [
            tuple(tokenize_py(a or "", analyzer))
            for a in (r["alternatives"] or [])
        ]
        alts = [a for a in alts if a]
        if alts:
            per_q[str(r["query_id"])] = alts
    if not per_q:
        return empty
    all_terms = sorted({t for alts in per_q.values() for a in alts for t in a})
    bucket_of = index.term_buckets(all_terms)
    live = {
        q: [a for a in alts if all(t in bucket_of for t in a)]
        for q, alts in per_q.items()
    }
    live = {q: alts for q, alts in live.items() if alts}
    if not live:
        return empty
    keyed = {
        f"{q}{_SPAN_SEP}{i}": a
        for q, alts in sorted(live.items())
        for i, a in enumerate(alts)
    }
    starts = _phrase_starts(index, keyed, bucket_of)
    alen = F.broadcast(inline_table(spark, 
        [(ck, len(a)) for ck, a in sorted(keyed.items())],
        "ck string, alen long",
    ))
    spans = (
        starts.join(alen, "ck")
        .select(
            F.split(F.col("ck"), _SPAN_SEP, 2)[0].alias("query_id"),
            "shard", "doc_ord",
            F.col("start").alias("s0"),
            (F.col("start") + F.col("alen") - 1).alias("s1"),
        )
        .distinct()
    )
    counted = spans.groupBy("query_id", "shard", "doc_ord").agg(
        F.count(F.lit(1)).cast("int").alias("n_spans")
    )
    qterms = [
        (q, t, float(c))
        for q, alts in sorted(live.items())
        for t, c in sorted(Counter(t for a in alts for t in a).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of)
    cand = counted.join(scores, ["query_id", "shard", "doc_ord"]).select(
        "query_id", "shard", "doc_ord", "score", "n_spans"
    )
    return _finalize(index, cand, k, ["n_spans"])
