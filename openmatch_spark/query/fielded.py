"""Fielded (multi-field) index: Lucene's actual storage model — every
field is its OWN term space with its own postings, norms (doc lengths),
and collection statistics — materialized as one packed sub-index per
field under `<index_dir>/field=<name>`, plus index-backed multi_match
over the family.

Why one sub-index per field instead of threading a field column through
the packed layout: that IS Lucene's design (per-field FieldInfo, terms
dict, and norms; a field's docCount/avgFieldLength never mix with
another's), and it composes with the WHOLE existing index lifecycle for
free — per-field compaction, deletes, resume, positional sidecars, and
stats rebaseline all just work because each field is a first-class
index. The fielded layer is a thin manifest + a query-time combiner.

Query semantics (mirrors the ad-hoc surfaces in query/dismax.py, which
tests pin against this implementation):

  best_fields   per (query, doc, TERM): max over fields of the field's
                BM25 contribution + tie_breaker * (sum - max); terms sum
                (Lucene DisjunctionMaxQuery per term).
  most_fields   the tie_breaker = 1 degenerate: per-field contributions
                sum outright.
  cross_fields  BlendedTermQuery: every field scores the term with the
                SAME blended df (the max across fields), then the
                per-term dis-max fold. The stored payload weight is
                idf_f * saturation, so the blend is the pure rescale
                w * idf_blend / idf_f — no tf recovery needed. The
                blended idf is evaluated inside each field's own
                docCount universe (Lucene rewrites df per reader; with
                every doc carrying every field the universes coincide
                and this equals the ad-hoc cross_fields).

A document missing a field (NULL/empty text) is simply absent from that
field's sub-index — Lucene's docCount semantics — and contributes
nothing from it at query time.

Scale shape: each per-field search half is the engine's own pruned
postings decode (vocabulary-pruned scan + Arrow block decode +
tombstone mask); the fold is one (query, doc, term) groupBy over
decoded rows bounded by query-vocabulary postings, then the standard
top-k window. Nothing corpus-sized is collected or broadcast.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from openmatch_spark.functions.bm25 import lucene_idf_col
from openmatch_spark.index.load import BM25Index
from openmatch_spark.functions.localrel import in_list, inline_table, literal_map

_MANIFEST = "fielded.json"
_TYPES = ("best_fields", "most_fields", "cross_fields")


def build_fielded_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    fields: list[str],
    **build_kw,
) -> dict:
    """Build one packed sub-index per field from `pages`
    (doc_id, <field columns>); returns {field: build stats}. Rows where
    a field is NULL or empty are absent from that field's sub-index.
    All build_index knobs (analyzer, num_shards, resume, ...) pass
    through unchanged and apply to every field — including store_attrs:
    attribute columns are doc-level, so each sub-index stores the same
    values in its own docmap (search_dsl_fielded's filter context
    evaluates predicates on the UNION of sub-index docmaps, so a doc
    missing one field still filters through another's)."""
    from openmatch_spark.index.build import build_index

    if not fields:
        raise ValueError("fields must name at least one text column")
    attrs = list(build_kw.get("store_attrs") or [])
    overlap = set(attrs) & set(fields)
    if overlap:
        raise ValueError(
            f"store_attrs {sorted(overlap)} collide with analyzed fields"
        )
    # per-field analyzers (the ES mapping shape): analyzer may be a
    # {field: analyzer} dict; each sub-index freezes its own in
    # stats.json and every query surface reads it from there
    analyzer = build_kw.pop("analyzer", None)
    if isinstance(analyzer, dict):
        missing = set(fields) - set(analyzer)
        if missing:
            raise ValueError(
                f"analyzer dict is missing fields {sorted(missing)}"
            )
    def _one(f: str):
        sub = pages.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(f).cast("string").alias("text"),
            *[F.col(a) for a in attrs],
        ).where(F.col(f).isNotNull() & (F.length(F.col(f)) > 0))
        kw = dict(build_kw)
        if analyzer is not None:
            kw["analyzer"] = (analyzer[f] if isinstance(analyzer, dict)
                              else analyzer)
        return build_index(
            spark, sub, os.path.join(index_dir, f"field={f}"), **kw
        )

    # Per-field sub-builds are fully independent jobs over disjoint output
    # dirs, so overlap them (2-3 in flight): each build's straggler tail
    # leaves most executors idle, and the next field's tasks back-fill
    # them. Index bytes are a pure function of corpus content (partition-
    # invariance is property-tested), so overlap cannot change the built
    # index. The only session-wide state the builds touch is the scoped
    # shuffle-partition / overwrite-mode confs, which every per-field
    # build sets to the same values here (same input, same kwargs).
    ordered = sorted(fields)
    if len(ordered) == 1:
        reports = {ordered[0]: _one(ordered[0])}
    else:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=min(3, len(ordered))) as pool:
            futs = {
                f: pool.submit(inheritable_thread_target(_one), f)
                for f in ordered
            }
            reports = {f: futs[f].result() for f in ordered}
    tmp = os.path.join(index_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"fields": sorted(fields)}, fh)
    os.replace(tmp, os.path.join(index_dir, _MANIFEST))
    return reports


def load_fielded_index(
    spark: SparkSession, index_dir: str
) -> dict[str, BM25Index]:
    """{field: BM25Index} for a directory written by
    build_fielded_index."""
    from openmatch_spark.index.load import load_index

    with open(os.path.join(index_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    return {
        f: load_index(spark, os.path.join(index_dir, f"field={f}"))
        for f in manifest["fields"]
    }


def _field_contribs(
    index: BM25Index, queries: DataFrame, field: str, boost: float,
    blended: bool,
) -> DataFrame | None:
    """(query_id, doc_id, term, s) for one field — qtf * stored payload
    weight * boost, the term left in for the cross-field fold; None when
    no query term is in this field's vocabulary. For the blended variant
    the df rides along so the caller can rescale AFTER computing the
    cross-field max df."""
    from openmatch_spark.index.compact import _decode_blocks_arrow
    from openmatch_spark.query.bm25_search import query_terms

    qt = query_terms(index, queries)
    if not qt:
        return None
    terms = sorted({t for (_, t, _, _) in qt})
    buckets = sorted({b for (_, _, _, b) in qt})
    decoded = index.postings.where(
        in_list("term_bucket", buckets) & in_list("term", terms)
    ).mapInArrow(
        _decode_blocks_arrow,
        "shard int, term string, term_bucket int, doc_ord long, weight double",
    )
    decoded = index.mask_deleted(decoded)
    qdf = F.broadcast(
        inline_table(index.spark, 
            sorted({(q, t, w) for (q, t, w, _) in qt}),
            "query_id string, term string, qtf double",
        )
    )
    hits = decoded.join(qdf, "term").join(
        index.docmap.select("shard", "doc_ord", "doc_id"),
        ["shard", "doc_ord"],
    )
    out = hits.select(
        "query_id",
        "doc_id",
        "term",
        (F.col("qtf") * F.col("weight") * F.lit(float(boost))).alias("s"),
    )
    if not blended:
        return out
    # cross_fields: expose this field's df and docCount so the caller can
    # divide the baked idf_f back out and multiply the blended idf in
    dic = F.broadcast(
        index.dictionary.where(in_list("term", terms)).select("term", "df")
    )
    n_docs = float(index.stats["n_docs"])
    return (
        out.join(dic, "term")
        .withColumn("_idf_f", lucene_idf_col(F.col("df"), n_docs))
        .withColumn("_n_docs", F.lit(n_docs))
    )


def search_fielded(
    indexes: dict[str, BM25Index],
    queries: DataFrame,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    field_boosts: dict[str, float] | None = None,
    k: int = 10,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — index-backed ES multi_match over
    a fielded index family. See the module docstring for the three
    match_type semantics; most_fields ignores tie_breaker (it IS the
    tie_breaker=1 fold)."""
    if match_type not in _TYPES:
        raise ValueError(f"match_type must be one of {_TYPES}, got {match_type!r}")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    if not indexes:
        raise ValueError("indexes must hold at least one field")
    boosts = {f: float((field_boosts or {}).get(f, 1.0)) for f in indexes}
    if any(w <= 0 for w in boosts.values()):
        raise ValueError(f"field boosts must be > 0, got {boosts}")
    blended = match_type == "cross_fields"
    tie = 1.0 if match_type == "most_fields" else float(tie_breaker)

    spark = next(iter(indexes.values())).spark
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int"
    )
    parts = []
    for f in sorted(indexes):
        c = _field_contribs(indexes[f], queries, f, boosts[f], blended)
        if c is not None:
            parts.append(c)
    if not parts:
        return empty
    contrib = parts[0]
    for p in parts[1:]:
        contrib = contrib.unionByName(p)
    if blended:
        # BlendedTermQuery: same (max) df for every field's idf, then
        # rescale the baked weight by idf_blend / idf_f inside each
        # field's own docCount universe
        blend = contrib.groupBy("term").agg(F.max("df").alias("_bdf"))
        # same expression shape as lucene_idf_col, with N as a column
        # (it differs per field when docs are missing fields)
        idf_blend = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col("_bdf") + 0.5)
            / (F.col("_bdf") + 0.5)
        )
        contrib = contrib.join(F.broadcast(blend), "term").withColumn(
            "s", F.col("s") * idf_blend / F.col("_idf_f")
        )
    per_term = contrib.groupBy("query_id", "doc_id", "term").agg(
        (F.max("s") + F.lit(tie) * (F.sum("s") - F.max("s"))).alias("w")
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.sum("w").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def search_dsl_fielded(
    findex: dict[str, BM25Index],
    queries,
    k: int = 100,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
    distributed_threshold: int | None = None,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) for ES-DSL query dicts
    with MULTI-FIELD leaves over a fielded index ({field: BM25Index}
    from load_fielded_index).

    Each leaf names any sub-index field (`{"match": {"title": ...}}`)
    and scores with that field's OWN statistics — per-field docCount,
    avgdl, and idf, Lucene's actual fielded scoring — so a bool over
    fields is ES's natural `bool` of per-field matches and a dis_max
    over fields is the classic best_fields shape. Composition
    (bool nesting, minimum_should_match, must_not, dis_max,
    bool.boost) is query/dsl.py's tree executor keyed on doc_id: one
    shared clause plan PER FIELD, sub-index candidates hydrated to
    doc_id through their own docmaps, then one aggregate per tree
    depth. Filter context works when the family was built with
    store_attrs: attrs are doc-level, so predicates evaluate on the
    UNION of sub-index docmaps and gate node results on doc_id (same
    semantics as the single-index surface — statistics and scores
    untouched); constant_score under must composes as gate + fixed
    bonus. What the fielded surface does NOT have is the constant doc
    PAGE shapes (top-level match_all / constant_score / filter-only
    bools) — a query must carry at least one scoring clause."""
    from openmatch_spark.query.dsl import (
        _CHECKPOINT_SMALL_DOCS,
        _GLUE,
        _TreeCtx,
        _compile_bool_node,
        _distributed_tok_cache,
        _walk_nodes,
    )
    from openmatch_spark.query.querystring import Clause, _execute_clauses

    if not findex:
        raise ValueError("findex is empty")
    fields = tuple(sorted(findex))
    first = findex[fields[0]]
    spark = first.spark
    # per-field analyzers (each sub-index froze its own in stats.json)
    analyzers = {f: findex[f].stats["analyzer"] for f in fields}

    tok_cache = None
    if isinstance(queries, DataFrame):
        # huge batches tokenize clause texts executor-side, per field's
        # own analyzer — the single-index surface's scale discipline
        queries, tok_cache = _distributed_tok_cache(
            queries, analyzers, distributed_threshold
        )

    from openmatch_spark.query.querystring import _tokens_cached

    def tokenize_py(text, a):
        return _tokens_cached(text, a, tok_cache)

    def _term_field_values(q):
        out = []
        if not isinstance(q, dict) or len(q) != 1:
            return out
        kind, body = next(iter(q.items()))
        if kind == "term" and isinstance(body, dict) and len(body) == 1:
            fld, spec = next(iter(body.items()))
            v = spec if isinstance(spec, str) else (
                spec.get("value") if isinstance(spec, dict) else None
            )
            if isinstance(v, str):
                out.append((fld, v))
        elif kind == "bool" and isinstance(body, dict):
            for role in ("must", "should", "must_not"):
                rs = body.get(role, [])
                rs = [rs] if isinstance(rs, dict) else rs
                for e in rs:
                    if isinstance(e, dict):
                        out.extend(_term_field_values(e))
        elif kind == "dis_max" and isinstance(body, dict):
            for e in body.get("queries", []) or []:
                if isinstance(e, dict):
                    out.extend(_term_field_values(e))
        return out

    trees: dict = {}
    for qid, qdict in sorted(queries.items()):
        qid = str(qid)
        qdict = rewrite_multi_match(qdict)
        if _GLUE in qid:
            raise ValueError(
                f"query_id {qid!r} contains the reserved separator U+001E"
            )
        for fld, v in _term_field_values(qdict):
            if fld not in analyzers:
                continue  # the compile raises the unknown-field error
            toks = tokenize_py(v, analyzers[fld])
            if len(toks) != 1:
                raise ValueError(
                    f"term value {v!r} analyzes to {len(toks)} tokens — "
                    "use match for multi-token text"
                )
        if not isinstance(qdict, dict) or len(qdict) != 1:
            raise ValueError(
                f"a DSL query maps exactly one query type, got {qdict!r}"
            )
        kind = next(iter(qdict))
        body = (qdict["bool"] if kind == "bool"
                else {"must": [qdict]} if kind in ("dis_max", "constant_score",
                                                   "match_all")
                else {"should": [qdict]})
        root = _compile_bool_node(body, analyzers, _TreeCtx(tok_cache), 0,
                                  fields=fields)
        if root is None:
            continue  # every clause analyzed away: the query matches nothing
        if not root.clause_items and not root.bool_items:
            raise ValueError(
                f"query {qid!r} has no scoring clause — the fielded DSL "
                "has no doc page shape (constant/filter-only queries "
                "belong on the single-index search_dsl surface)"
            )
        trees[qid] = root

    # ---- filter context on the UNION of sub-index docmaps: attrs are
    # doc-level and stored identically in every sub-index, so a doc
    # missing one field still filters through another's docmap ----
    from openmatch_spark.query.dsl import _filter_sql

    stored = tuple(sorted(
        set.intersection(*(set(findex[f].stored_attrs) for f in fields))
    )) if all(findex[f].stored_attrs for f in fields) else tuple()
    fids: dict = {}
    fmap_rows: list = []
    amap_rows: list = []
    for qid, root in sorted(trees.items()):
        for node in _walk_nodes(root):
            need = [f2 for fspecs in node.filters + node.anti_filters
                    for f2 in fspecs if f2["kind"] not in ("ids", "all")]
            if need and not stored:
                raise ValueError(
                    "bool.filter needs stored doc values, but this fielded "
                    "index was built without store_attrs (ids filters work "
                    "on any index)"
                )
            if node.filters:
                specs = [f2 for fspecs in node.filters for f2 in fspecs]
                real = [f2 for f2 in specs if f2["kind"] != "all"]
                sql = " AND ".join(
                    f"({_filter_sql(f2, stored)})" for f2 in real
                ) if real else None
                if sql is not None:
                    fmap_rows.append(
                        (qid, node.node_id, fids.setdefault(sql, len(fids)))
                    )
            for fspecs in node.anti_filters:
                sql = " AND ".join(
                    f"({_filter_sql(f2, stored)})" for f2 in fspecs
                )
                amap_rows.append(
                    (qid, node.node_id, fids.setdefault(sql, len(fids)))
                )
    allowed = None
    for sql, fid in sorted(fids.items(), key=lambda kv: kv[1]):
        a = None
        for f2 in fields:
            part = findex[f2].docmap.where(F.expr(sql)).select("doc_id")
            a = part if a is None else a.unionByName(part)
        a = a.distinct().select(F.lit(fid).cast("int").alias("fid"), "doc_id")
        allowed = a if allowed is None else allowed.unionByName(a)

    # ---- one shared clause plan per FIELD, candidates keyed by doc_id ----
    per_field: dict = {}
    for qid, root in sorted(trees.items()):
        for node in _walk_nodes(root):
            for (iid, _, c) in node.clause_items:
                per_field.setdefault(c.fieldname, {})[
                    f"{qid}{_GLUE}{iid}"
                ] = [Clause("should", c.kind, c.text, c.boost, slop=c.slop,
                            edits=c.edits, tokens=c.tokens)]
    items = None
    for f in sorted(per_field):
        sub = findex[f]
        cand = _execute_clauses(
            sub, per_field[f], k, {}, max_expansions, fuzzy_prefix_len,
            finalize=False,
        )
        hyd = (
            sub.mask_deleted(cand)
            .join(sub.docmap.select("shard", "doc_ord", "doc_id"),
                  ["shard", "doc_ord"])
            .select(
                F.substring_index("query_id", _GLUE, 1).alias("query_id"),
                F.substring_index("query_id", _GLUE, -1).cast("int")
                .alias("iid"),
                "doc_id", "score",
            )
        )
        items = hyd if items is None else items.unionByName(hyd)
    empty = spark.createDataFrame(
        [], "query_id string, doc_id string, score double, rank int"
    )
    if items is None or not trees:
        return empty
    item_src = items.localCheckpoint()

    # ---- compose bottom-up, one aggregate per depth (doc_id-keyed
    # twin of dsl._execute_tree's loop, minus the filter machinery) ----
    max_depth = max(
        node.depth for root in trees.values() for node in _walk_nodes(root)
    )
    root_out = None
    for depth in range(max_depth, -1, -1):
        level = [
            (qid, node) for qid, root in sorted(trees.items())
            for node in _walk_nodes(root) if node.depth == depth
        ]
        meta_rows = [
            (qid, iid, node.node_id, role)
            for (qid, node) in level
            for (iid, role, _) in node.clause_items + node.bool_items
        ]
        gate_rows = [
            (qid, node.node_id, node.n_must, node.msm,
             int(node.combine == "dis_max"), float(node.tie_breaker),
             float(node.boost), float(node.const_bonus))
            for (qid, node) in level
        ]
        # one-to-one per-level metadata rides as literal maps (same
        # rationale and key glue as dsl._execute_tree)
        meta_m = literal_map(
            {f"{q}{_GLUE}{i}": (n, r) for (q, i, n, r) in meta_rows},
            "string", "node int, role string",
        )
        gates_m = literal_map(
            {f"{q}{_GLUE}{n}": rest for (q, n, *rest) in gate_rows},
            "string",
            "n_must int, msm int,"
            " dismax int, tb double, mult double, bonus double",
        )
        res = (
            item_src.withColumn(
                "_mt",
                F.element_at(
                    meta_m,
                    F.concat_ws(
                        _GLUE, F.col("query_id"),
                        F.col("iid").cast("string"),
                    ),
                ),
            )
            .where(F.col("_mt").isNotNull())
            .select(
                "query_id", "iid", "doc_id", "score",
                F.col("_mt.node").alias("node"),
                F.col("_mt.role").alias("role"),
            )
            .groupBy("query_id", "node", "doc_id")
            .agg(
                F.sum(
                    F.when(F.col("role") != "must_not", F.col("score"))
                    .otherwise(F.lit(0.0))
                ).alias("score"),
                F.count_distinct(
                    F.when(F.col("role") == "must", F.col("iid"))
                ).alias("must_m"),
                F.count_distinct(
                    F.when(F.col("role") == "should", F.col("iid"))
                ).alias("should_m"),
                F.count_distinct(
                    F.when(F.col("role") == "must_not", F.col("iid"))
                ).alias("not_m"),
                F.max(
                    F.when(F.col("role") != "must_not", F.col("score"))
                ).alias("max_s"),
            )
            .withColumn(
                "_g",
                F.element_at(
                    gates_m,
                    F.concat_ws(
                        _GLUE, F.col("query_id"), F.col("node").cast("string")
                    ),
                ),
            )
            .where(
                F.col("_g").isNotNull()
                & (F.col("must_m") == F.col("_g.n_must"))
                & (F.col("should_m") >= F.col("_g.msm"))
                & (F.col("not_m") == 0)
                & (F.col("must_m") + F.col("should_m") >= 1)
            )
            .select(
                "query_id", "node", "doc_id",
                (
                    (
                        F.when(
                            F.col("_g.dismax") == 1,
                            F.col("max_s")
                            + F.col("_g.tb")
                            * (F.col("score") - F.col("max_s")),
                        ).otherwise(F.col("score"))
                        + F.col("_g.bonus")
                    )
                    * F.col("_g.mult")
                ).alias("score"),
            )
        )
        level_keys = {(lq, ln.node_id) for (lq, ln) in level}
        lvl_fmap = [(q, n, f2) for (q, n, f2) in fmap_rows
                    if (q, n) in level_keys]
        if lvl_fmap:
            fm_m = literal_map(
                {f"{q}{_GLUE}{n}": f2 for (q, n, f2) in lvl_fmap},
                "string", "fid int",
            )
            probe = allowed.select("fid", "doc_id", F.lit(1).alias("_fhit"))
            res = (
                res.withColumn(
                    "fid",
                    F.element_at(
                        fm_m,
                        F.concat_ws(
                            _GLUE, F.col("query_id"),
                            F.col("node").cast("string"),
                        ),
                    ),
                )
                .join(probe, ["fid", "doc_id"], "left")
                .where(F.col("fid").isNull() | F.col("_fhit").isNotNull())
                .select("query_id", "node", "doc_id", "score")
            )
        lvl_amap = [(q, n, f2) for (q, n, f2) in amap_rows
                    if (q, n) in level_keys]
        if lvl_amap:
            am = F.broadcast(inline_table(spark, 
                lvl_amap, "query_id string, node int, fid int"
            ))
            excl = am.join(allowed, "fid").select("query_id", "node", "doc_id")
            res = res.join(excl, ["query_id", "node", "doc_id"], "left_anti")
        if depth == 0:
            root_out = res.select("query_id", "doc_id", "score")
        else:
            parent_map = [
                (qid, child.node_id, iid)
                for qid, root in sorted(trees.items())
                for node in _walk_nodes(root)
                for (iid, _, child) in node.bool_items
                if child.depth == depth
            ]
            pm_m = literal_map(
                {f"{q}{_GLUE}{n}": i for (q, n, i) in parent_map},
                "string", "iid int",
            )
            conv = res.withColumn(
                "iid",
                F.element_at(
                    pm_m,
                    F.concat_ws(
                        _GLUE, F.col("query_id"), F.col("node").cast("string")
                    ),
                ),
            ).where(F.col("iid").isNotNull()).select(
                "query_id", "iid", "doc_id", "score"
            )
            if depth > 1 and (
                len(trees) > 64
                or max(
                    sum(ix._manifest_counts().values())
                    for ix in findex.values()
                )
                > _CHECKPOINT_SMALL_DOCS
            ):
                # at depth 1 only the root remains and references this
                # once — checkpointing there is pure overhead. Below
                # that, skip the checkpoint only when BOTH the batch and
                # the index are small: the job round is a fixed ~0.1 s
                # while the re-embedded aggregate's recompute scales
                # with corpus size (results identical either way).
                conv = conv.localCheckpoint()
            item_src = item_src.unionByName(conv)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        root_out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


_MM_TYPES = ("best_fields", "most_fields", "phrase")


def _parse_mm_fields(entries) -> list:
    """multi_match fields list -> [(field, boost)]; 'name^2' syntax."""
    if not isinstance(entries, list) or not entries:
        raise ValueError("multi_match fields must be a non-empty list")
    out = []
    for e in entries:
        if not isinstance(e, str) or not e:
            raise ValueError(f"multi_match field entries are strings, got {e!r}")
        name, _, b = e.partition("^")
        boost = float(b) if b else 1.0
        if boost <= 0:
            raise ValueError(f"boost must be positive, got {boost}")
        out.append((name, boost))
    return out


def rewrite_multi_match(q):
    """Recursively replace {"multi_match": ...} nodes with their
    bool / dis_max decomposition (ES's own documented rewrite):
    best_fields -> dis_max of per-field match clauses with the given
    tie_breaker; most_fields -> bool.should of them (scores sum);
    phrase -> dis_max of per-field match_phrase clauses (needs each
    sub-index's positional sidecar). cross_fields is term-centric and
    lives on search_fielded, not the DSL. Pure and compile-time — the
    result runs on already-verified constructs."""
    if not isinstance(q, dict) or len(q) != 1:
        return q
    kind, body = next(iter(q.items()))
    if kind == "multi_match":
        if not isinstance(body, dict) or "query" not in body \
                or "fields" not in body \
                or not set(body) <= {"query", "fields", "type", "tie_breaker"}:
            raise ValueError(
                "multi_match needs {'query', 'fields', 'type'?, "
                f"'tie_breaker'?}}, got {body!r}"
            )
        text = body["query"]
        if not isinstance(text, str) or not text.strip():
            raise ValueError("multi_match query must be a non-empty string")
        mtype = body.get("type", "best_fields")
        if mtype not in _MM_TYPES:
            raise ValueError(
                f"multi_match type {mtype!r} unsupported here (supported: "
                f"{', '.join(_MM_TYPES)}; cross_fields is search_fielded's "
                "term-centric surface)"
            )
        tb = float(body.get("tie_breaker", 0.0))
        leaf = "match_phrase" if mtype == "phrase" else "match"
        key = "query"
        leaves = [
            {leaf: {f: {key: text, "boost": b}}}
            for (f, b) in _parse_mm_fields(body["fields"])
        ]
        if mtype == "most_fields":
            if "tie_breaker" in body:
                raise ValueError("tie_breaker only applies to best_fields/phrase")
            return {"bool": {"should": leaves}}
        return {"dis_max": {"queries": leaves, "tie_breaker": tb}}
    if kind == "bool" and isinstance(body, dict):
        out = {}
        for role, entries in body.items():
            if role in ("must", "should", "must_not"):
                entries = [entries] if isinstance(entries, dict) else entries
                out[role] = [rewrite_multi_match(e) for e in entries]
            else:
                out[role] = entries
        return {"bool": out}
    if kind == "dis_max" and isinstance(body, dict):
        out = dict(body)
        if isinstance(body.get("queries"), list):
            out["queries"] = [rewrite_multi_match(e) for e in body["queries"]]
        return {"dis_max": out}
    return q


def delete_docs_fielded(
    spark: SparkSession,
    index_dir: str,
    doc_ids,
) -> dict:
    """Tombstone doc_ids in EVERY sub-index of a fielded family.

    Tombstones are doc-level (VERDICT r4 item 5): a deleted document must
    vanish from all fields at once, and because each field is a
    first-class packed index the propagation is one docmap resolve +
    tombstone append per field (index/deletes.py delete_docs — idempotent,
    unknown ids a no-op). A doc absent from some field's sub-index (NULL
    field at build time) simply matches nothing there. Returns
    {field: delete_docs result}."""
    from openmatch_spark.index.deletes import delete_docs

    with open(os.path.join(index_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    return {
        f: delete_docs(spark, os.path.join(index_dir, f"field={f}"), doc_ids)
        for f in manifest["fields"]
    }


def upsert_docs_fielded(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
) -> dict:
    """Replace (or insert) pages (doc_id, <field columns>[, attrs])
    across the whole fielded family.

    Per field: tombstone EVERY given doc_id first (so a new version whose
    field went NULL/empty correctly loses its old postings in that field
    — plain upsert_docs alone would only replace, not retract), then
    ingest the non-empty rows as one appended segment with the
    sub-index's frozen analyzer/stats (index/deletes.py upsert_docs
    semantics: frozen base statistics + extended dictionary; a later
    compact_fielded_index(rebaseline_stats=True) converges scores to a
    fresh fielded build). Attr columns frozen in each sub-index's stats
    (store_attrs) must be present on pages. Returns {field: {"deleted",
    "upserted"}}."""
    from openmatch_spark.index.deletes import delete_docs, upsert_docs
    from openmatch_spark.index.storage import IndexStorage

    with open(os.path.join(index_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    ids = pages.select(F.col("doc_id").cast("string").alias("doc_id"))
    out = {}
    for f in manifest["fields"]:
        sub_dir = os.path.join(index_dir, f"field={f}")
        deleted = delete_docs(spark, sub_dir, ids)
        attrs = tuple(
            IndexStorage.resolve(spark, sub_dir).read_stats().get(
                "store_attrs"
            ) or ()
        )
        sub = pages.select(
            F.col("doc_id").cast("string").alias("url"),
            F.col(f).cast("string").alias("text"),
            *[F.col(a) for a in attrs],
        ).where(F.col(f).isNotNull() & (F.length(F.col(f)) > 0))
        if sub.limit(1).count() == 0:
            out[f] = {"deleted": deleted, "upserted": None}
            continue
        out[f] = {"deleted": deleted, "upserted": upsert_docs(
            spark, sub, sub_dir
        )}
    return out


def compact_fielded_index(
    spark: SparkSession,
    index_dir: str,
    auto: bool = False,
    **compact_kw,
) -> dict:
    """Compact every sub-index of a fielded family (each field is a
    first-class packed index, so this is the per-field loop the module
    docstring promises — search-identity per field is the single-index
    compaction contract, property-tested in tests/test_compaction.py).
    auto=False runs one full merge per field (compact_index defaults);
    auto=True runs the tiered policy per field (compact_auto). Returns
    {field: result}."""
    from openmatch_spark.index import compact_auto, compact_index
    from openmatch_spark.index.storage import IndexStorage

    with open(os.path.join(index_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    out = {}
    for f in manifest["fields"]:
        sub_dir = os.path.join(index_dir, f"field={f}")
        if auto:
            out[f] = compact_auto(spark, sub_dir, **compact_kw)
            continue
        store = IndexStorage.resolve(spark, sub_dir)
        n_shards = store.read("manifest").count()
        # a single committed segment has nothing to MERGE — but a 1-shard
        # compact is still meaningful work when a rebaseline/prune was
        # requested (compact_index re-weights in place) or tombstones are
        # pending (the merge purges them physically); skipping those left
        # rebaseline_stats=True silently unapplied on 1-shard fields
        idle = (
            n_shards < 2
            and not compact_kw.get("rebaseline_stats")
            and compact_kw.get("prune_keep_per_term") is None
            and not store.exists("deletes")
        )
        if idle:
            out[f] = {"merged": [], "new_shard": None,
                      "skipped": "single shard"}
            continue
        out[f] = compact_index(spark, sub_dir, **compact_kw)
    return out
