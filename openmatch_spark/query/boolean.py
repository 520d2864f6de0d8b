"""Boolean-structured BM25 search over the packed index (MUST / SHOULD /
MUST_NOT composition — the Lucene `BooleanQuery` surface the reference's
Anserini-style first stage exposes through Pyserini query syntax; reference
counterpart: none in-repo, semantics per Lucene's BooleanClause.Occur).

Semantics (Lucene-compatible):
  * MUST     — every must term is required. A must term missing from the
               index vocabulary kills the whole query (zero hits), exactly
               like a required TermQuery on an unseen term.
  * SHOULD   — optional; contributes to the score only.
  * MUST_NOT — any hit containing one is excluded. Purely restrictive:
               never contributes to scoring.
  * min_should_match — Lucene's setMinimumNumberShouldMatch: a hit must
               additionally match at least this many DISTINCT should
               terms. A term listed in both must and should merges into
               the must role (one clause, Lucene's deduped-builder
               behavior) and does not count toward the should quota; a
               query with fewer in-vocabulary should terms than the quota
               is structurally unsatisfiable (zero hits), like Lucene.
  * score    — BM25 sum over MUST + SHOULD terms present in the doc, with
               query-term-frequency multiplicity (a term repeated across
               must+should multiplies its weight), identical weighting to
               `search()`.
  * a query with no scoring terms (only MUST_NOT, or everything OOV)
    returns no hits — nothing can rank it.

Plan (one declarative plan, no driver loops over docs):

  queries ─tokenize 3 fields─► role-tagged (query_id, term, qtf, is_must)
                               + per-query required-term count (pre-vocab!)
  postings ─bucket+term-pruned scan─► blocks for referenced terms only
           ─mapInArrow decode─► (shard, term, doc_ord, weight) rows
           ─broadcast join scoring terms─► per-(query, shard, doc) agg:
                score = Σ weight·qtf,  n_must = Σ is_must
           ─filter n_must == required[query]─► AND semantics
           ─left_anti (query, shard, doc) ∈ must_not postings─► NOT
           ─window top-k ─ docmap broadcast join─► run

Scale shape: the postings scan is pruned to the queried term buckets
(PushedFilters), decode is a vectorized Arrow kernel, and the score agg
shuffles Σ df(must ∪ should) decoded rows exactly once with map-side
partial aggregation. MUST_NOT postings never enter the score aggregate:
they are distinct-projected and anti-joined against the already-filtered
candidate set, so a stop-word-ish exclusion term costs one bounded
shuffle of its own postings, not a pass through the scorer. The final
docmap join broadcasts the ≤ queries×k hit set, never the docmap.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.index.compact import _decode_blocks_arrow
from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.bm25_search import _DISTRIBUTED_TOKENIZE_MIN_QUERIES
from openmatch_spark.functions.localrel import in_list, inline_table, literal_map

_DECODED = "shard int, term string, term_bucket int, doc_ord long, weight double"


def _role_tokens(rows, analyzer: str):
    """Driver-side tokenize of the three role fields.

    Returns (scoring, must_not, required, dead):
      scoring: {(query_id, term): (qtf, is_must)}
      must_not: set[(query_id, term)]
      required: {query_id: n distinct must terms} — counted BEFORE the
                vocabulary join, so an OOV must term can never be satisfied
      dead: query_ids with no scoring terms at all
    """
    from openmatch_spark.analysis import tokenize_py

    scoring: dict[tuple[str, str], list] = {}
    must_not: set[tuple[str, str]] = set()
    required: dict[str, int] = {}
    dead: set[str] = set()
    for r in rows:
        qid = str(r["query_id"])
        must = Counter(tokenize_py(r["must"] or "", analyzer))
        should = Counter(tokenize_py(r["should"] or "", analyzer))
        nots = set(tokenize_py(r["must_not"] or "", analyzer))
        required[qid] = len(must)
        if not must and not should:
            dead.add(qid)
            continue
        for t, c in must.items():
            scoring[(qid, t)] = [float(c), 1]
        for t, c in should.items():
            if (qid, t) in scoring:
                scoring[(qid, t)][0] += float(c)
            else:
                scoring[(qid, t)] = [float(c), 0]
        for t in nots:
            must_not.add((qid, t))
    return scoring, must_not, required, dead


def _rank_and_hydrate(index: BM25Index, candidates: DataFrame, k: int) -> DataFrame:
    """Shared tail: rank-cut candidates (keeping k-th-score ties for the
    doc_id tie-break, which only exists after the docmap join), broadcast
    the bounded hit set against the docmap scan, final row_number.

    Tombstoned docs (index/deletes.py) are masked BEFORE the rank cut so a
    deleted doc never consumes a top-k slot."""
    candidates = index.mask_deleted(candidates)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"))
    cut = candidates.withColumn("_r", F.rank().over(w)).where(F.col("_r") <= k)
    hits = index.docmap.select("shard", "doc_ord", "doc_id").join(
        F.broadcast(cut.select("query_id", "shard", "doc_ord", "score")),
        ["shard", "doc_ord"],
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def _msm_filter(candidates: DataFrame, min_should_match: int) -> DataFrame:
    """Apply the should-quota: candidates carries n_should (count of
    DISTINCT matched should-only terms — decoded posting rows are unique
    per (term, doc), so the sum IS a distinct count). Zero-cost when the
    quota is off."""
    if min_should_match <= 0:
        return candidates
    return candidates.where(F.col("n_should") >= min_should_match)


def _search_boolean_distributed(
    index: BM25Index, q: DataFrame, k: int, min_should_match: int = 0
) -> DataFrame:
    """Executor-side variant for big batches: raw query text never crosses
    the driver — roles tokenize as column expressions, and only the
    DISTINCT TERM set (bounded by vocabulary, not batch size) is collected
    to plan the pruned scan. OOV-must semantics fall out structurally:
    required counts all must tokens PRE-vocabulary while matches count
    posting joins, so the equality filter kills OOV-must queries without
    any explicit dead-list."""
    from openmatch_spark.analysis import tokenize_col

    analyzer = index.stats["analyzer"]
    tagged = None
    for role, flag in (("must", 1), ("should", 0)):
        part = q.select(
            "query_id",
            F.explode(tokenize_col(F.col(role), analyzer)).alias("term"),
            F.lit(flag).alias("is_must"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    scoring = tagged.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf"),
        F.max("is_must").alias("is_must"),
    )
    req = (
        q.select("query_id").distinct()
        .join(
            q.select(
                "query_id", F.explode(tokenize_col(F.col("must"), analyzer)).alias("term")
            )
            .groupBy("query_id")
            .agg(F.countDistinct("term").alias("_n")),
            "query_id",
            "left",
        )
        .select("query_id", F.coalesce("_n", F.lit(0)).alias("n_required"))
    )
    nots = q.select(
        "query_id", F.explode(tokenize_col(F.col("must_not"), analyzer)).alias("term")
    ).distinct()
    scoring.persist()
    nots.persist()
    terms = sorted(
        r["term"]
        for r in scoring.select("term").union(nots.select("term")).distinct().collect()
    )
    bucket_of = index.term_buckets(terms)
    in_vocab = sorted(t for t in terms if t in bucket_of)
    if not in_vocab:
        scoring.unpersist()
        nots.unpersist()
        return index.spark.createDataFrame(
            [], "query_id string, doc_id string, score double, rank int"
        )
    buckets = sorted({bucket_of[t] for t in in_vocab})
    decoded = index.postings.where(
        in_list("term_bucket", buckets) & in_list("term", in_vocab)
    ).mapInArrow(_decode_blocks_arrow, _DECODED)
    candidates = (
        decoded.join(scoring, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(
            F.sum(F.col("weight") * F.col("qtf")).alias("score"),
            F.sum("is_must").alias("n_must"),
            F.sum(F.lit(1) - F.col("is_must")).alias("n_should"),
        )
        .join(req, "query_id")
        .where(F.col("n_must") == F.col("n_required"))
    )
    candidates = _msm_filter(candidates, min_should_match).select(
        "query_id", "shard", "doc_ord", "score"
    )
    excluded = (
        decoded.join(nots, "term")
        .select("query_id", "shard", "doc_ord")
        .distinct()
    )
    candidates = candidates.join(
        excluded, ["query_id", "shard", "doc_ord"], "left_anti"
    )
    return _rank_and_hydrate(index, candidates, k)


def search_boolean(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    min_should_match: int = 0,
) -> DataFrame:
    """Top-k boolean BM25 run: (query_id, doc_id, score, rank).

    queries: (query_id, must, should, must_not) — each role a free-text
    string tokenized by the index analyzer; NULL/empty roles allowed.
    min_should_match: required count of DISTINCT matched should terms per
    hit, on top of the must AND-semantics (module doc). Batches above
    distributed_threshold tokenize executor-side (identical results —
    forced-branch identity-tested); small batches stay on the
    zero-extra-job driver path for latency."""
    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int"
    )
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"),
        "must", "should", "must_not",
    )
    rows = q.take(distributed_threshold + 1)
    if not rows:
        return empty
    if len(rows) > distributed_threshold:
        return _search_boolean_distributed(index, q, k, min_should_match)
    scoring, nots, required, dead = _role_tokens(rows, analyzer)

    all_terms = sorted({t for (_, t) in scoring} | {t for (_, t) in nots})
    if not all_terms:
        return empty
    bucket_of = index.term_buckets(all_terms)  # in-vocab only

    # a MUST term outside the vocabulary is unsatisfiable -> query is dead
    for (qid, t), (_, is_must) in scoring.items():
        if is_must and t not in bucket_of:
            dead.add(qid)
    live_scoring = [
        (qid, t, qtf, is_must)
        for (qid, t), (qtf, is_must) in sorted(scoring.items())
        if qid not in dead and t in bucket_of
    ]
    if not live_scoring:
        return empty
    live_nots = sorted(
        (qid, t) for (qid, t) in nots if qid not in dead and t in bucket_of
    )

    score_terms = sorted({t for (_, t, _, _) in live_scoring})
    not_terms = sorted({t for (_, t) in live_nots})
    terms = sorted(set(score_terms) | set(not_terms))
    buckets = sorted({bucket_of[t] for t in terms})
    decoded = (
        index.postings.where(
            in_list("term_bucket", buckets) & in_list("term", terms)
        )
        .mapInArrow(_decode_blocks_arrow, _DECODED)
    )

    qt = F.broadcast(
        inline_table(
            spark, live_scoring,
            "query_id string, term string, qtf double, is_must int",
        )
    )
    # required-must counts are a one-to-one lookup on the unique query_id:
    # a literal map + isNotNull reproduces the former inner broadcast join
    # (same dropped-rows semantics for queries absent from the map) with
    # no broadcast stage (the dsl/querystring executors' discipline)
    req_m = literal_map(
        {q: n for q, n in sorted(required.items()) if q not in dead},
        "string", "n_required int",
    )
    candidates = (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(
            F.sum(F.col("weight") * F.col("qtf")).alias("score"),
            F.sum("is_must").alias("n_must"),
            F.sum(F.lit(1) - F.col("is_must")).alias("n_should"),
        )
        .withColumn("n_required", F.element_at(req_m, F.col("query_id")))
        .where(
            F.col("n_required").isNotNull()
            & (F.col("n_must") == F.col("n_required"))
        )
        .drop("n_required")
    )
    candidates = _msm_filter(candidates, min_should_match).select(
        "query_id", "shard", "doc_ord", "score"
    )
    if live_nots:
        qn = F.broadcast(
            inline_table(spark, live_nots, "query_id string, term string")
        )
        excluded = (
            decoded.where(in_list("term", not_terms))
            .join(qn, "term")
            .select("query_id", "shard", "doc_ord")
            .distinct()
        )
        candidates = candidates.join(
            excluded, ["query_id", "shard", "doc_ord"], "left_anti"
        )

    return _rank_and_hydrate(index, candidates, k)


def search_terms_set(
    index: BM25Index,
    queries: DataFrame,
    msm_attrs: DataFrame,
    msm_col: str,
    k: int = 100,
) -> DataFrame:
    """The ES `terms_set` query (minimum_should_match_field flavor): every
    query token is a SHOULD clause, and each DOC carries its own required
    match count in an attribute column — a doc matches iff it contains at
    least `msm(doc)` DISTINCT query terms. (query_id, doc_id, score, rank,
    n_matched, msm_required); score = the engine's BM25 sum over matched
    terms with qtf multiplicity.

    msm semantics, documented: the per-doc value is clamped up to 1 (ES
    scripts commonly clamp the same way); a doc whose msm value is NULL
    or missing from msm_attrs never matches (the field IS the contract);
    msm > the query's in-vocabulary term count is naturally unmatchable.

    Plan: one pruned postings decode + broadcast term join + one
    (query, doc) aggregate — search_boolean's shape — then the msm
    attribute reaches the CANDIDATE space through two bounded joins: the
    docmap slice is semi-joined down to candidate docs before touching
    the corpus-sized attribute table, so no corpus×corpus shuffle; the
    rank cut runs after the filter (a per-doc threshold can't commute
    with top-k)."""
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    empty = spark.createDataFrame(
        [],
        "query_id string, doc_id string, score double, rank int, "
        "n_matched int, msm_required int",
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
    live = [
        (q, t, float(c))
        for q, toks in sorted(qtoks.items())
        for t, c in sorted(Counter(toks).items())
        if t in bucket_of
    ]
    if not live:
        return empty
    terms = sorted({t for (_, t, _) in live})
    buckets = sorted({bucket_of[t] for t in terms})
    decoded = index.postings.where(
        in_list("term_bucket", buckets) & in_list("term", terms)
    ).mapInArrow(_decode_blocks_arrow, _DECODED)
    qt = F.broadcast(
        inline_table(spark, live, "query_id string, term string, qtf double")
    )
    cand = (
        decoded.join(qt, "term")
        .groupBy("query_id", "shard", "doc_ord")
        .agg(
            F.sum(F.col("weight") * F.col("qtf")).alias("score"),
            F.countDistinct("term").cast("int").alias("n_matched"),
        )
    )
    cand = index.mask_deleted(cand)
    # per-doc threshold: docmap slice bounded by candidate docs FIRST,
    # then the attribute join runs over that bounded slice only
    ids = cand.select("shard", "doc_ord").distinct()
    id_slice = index.docmap.select("shard", "doc_ord", "doc_id").join(
        ids, ["shard", "doc_ord"], "left_semi"
    )
    # filter the RAW column first: greatest() skips NULLs, so clamping a
    # NULL threshold would silently turn "no contract" into "msm 1"
    attrs = (
        msm_attrs.where(F.col(msm_col).isNotNull())
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.greatest(F.col(msm_col).cast("int"), F.lit(1)).alias(
                "msm_required"
            ),
        )
    )
    msm_slice = id_slice.join(attrs, "doc_id").select(
        "shard", "doc_ord", "doc_id", "msm_required"
    )
    hits = cand.join(msm_slice, ["shard", "doc_ord"]).where(
        F.col("n_matched") >= F.col("msm_required")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score", "rank", "n_matched", "msm_required"
        )
    )
