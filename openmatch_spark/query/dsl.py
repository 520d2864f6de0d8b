"""ES Query-DSL front door: compile a JSON query dict onto the engine's
verified clause machinery and execute it against the packed index.

This is the `_search` request-body surface: the same leaf queries the
engine already answers one-by-one (match, match_phrase, term, prefix,
wildcard, fuzzy, regexp) composed under one `bool`, expressed as the ES
JSON dialect instead of the Lucene-classic query string. Compilation
targets query/querystring.py's Clause executor, so every role rule,
expansion cap, weight, and plan shape is byte-identical to the
query_string surface (one decode + one broadcast clause join + one
(query, doc) aggregate; must_not anti-joined after aggregation; phrase
clauses over the positional sidecar).

Supported grammar (one dict per query):

  {"match":        {"text": q | {"query": q, "operator": "or"|"and",
                                  "boost": b}}}
  {"match_phrase": {"text": q | {"query": q, "slop": n, "boost": b}}}
  {"term":         {"text": v | {"value": v, "boost": b}}}   (one token)
  {"prefix":       {"text": v | {"value": v, "boost": b}}}
  {"wildcard":     {"text": p | {"value": p, "boost": b}}}
  {"regexp":       {"text": p | {"value": p, "boost": b}}}
  {"fuzzy":        {"text": v | {"value": v, "fuzziness": n, "boost": b}}}
  {"bool":         {"must": [...], "should": [...], "must_not": [...],
                    "filter": [...], "minimum_should_match": n,
                    "boost": b}}   (boost multiplies the bool's final
                    score — nested or top-level; a boosted flat bool
                    routes onto the tree path)
  {"constant_score": {"filter": leaf | [leaves] | filter-only bool,
                      "boost": b}}   (every passing doc scores b; under
                      bool.must it is a gate + fixed bonus, under
                      must_not an exclusion; should is refused)
  {"match_all":    {"boost": b}}     (top level: the full-corpus page at
                      score b, first k by doc_id; under must: a fixed
                      bonus on every passing doc)
  {"dis_max":      {"queries": [...], "tie_breaker": t}}   (score =
                      max(matched branches) + t × (sum of the others);
                      a multi-clause leaf branch sums INSIDE the branch
                      first; composes anywhere a bool can appear)

`bool.filter` is ES filter context — non-scoring, must-match, and per
Lucene semantics it restricts the CANDIDATE set, never the statistics
(idf/avgdl stay corpus-wide; surviving docs keep their unfiltered
scores — the same contract query/filtered.py documents). Filter leaves
are ATTRIBUTE predicates evaluated on the index's own doc-values store
(build_index store_attrs) — no corpus access, no doc_id join:

  {"term":   {attr: v | {"value": v}}}
  {"terms":  {attr: [v, ...]}}
  {"range":  {attr: {"gte"/"gt"/"lte"/"lt": v, ...}}}
  {"exists": {"field": attr}}
  {"ids":    {"values": [doc_id, ...]}}        (the docmap's own key)

A bool with ONLY filter clauses is the match_all-in-filter-context
shape: every passing doc scores 0.0 and the page is the k first docs
by doc_id (deterministic; ES returns constant 0 scores there too).
Execution: each query's filter conjunction compiles to ONE predicate
over the column-pruned docmap scan; distinct predicates are evaluated
once per BATCH (not per query) and the allowed (shard, doc_ord) sets
semi-join the full candidate set BEFORE the top-k cut — correct here
precisely because the clause executor scores every matching doc (no
per-shard pre-cut to lose filtered-in docs), and the filter-only leg is
row_number-bounded to k per query before it ever unions in.

`bool` NESTS: a bool may appear inside must / should / must_not of
another bool, to any depth. Semantics are Lucene BooleanQuery
composition — a nested bool is ONE clause of its parent (it counts once
toward the parent's minimum_should_match), it matches a doc when its
own must/should/msm/filter rules hold, and when matched it contributes
the SUM of its matched scoring clauses to the parent's score. Nested
bools may carry their own filter context. Two compile-time rewrites
keep plans tight without changing semantics:
  * `must: [{bool: {filter: [...]}}]` (a filter-only bool under must)
    folds its predicates into the parent's filter conjunction;
  * `must_not: [{bool: {filter: [...]}}]` becomes a predicate
    ANTI-gate — this is also the supported way to exclude by attribute.
Execution (nested queries only; non-nested queries keep the flat
plan): every analyzed leaf clause anywhere in the tree becomes an
ITEM executed as its own pseudo-query in ONE shared clause plan (one
decode, one aggregate — the flat plan's shape), then bool nodes
compose bottom-up, one (query, node, doc) aggregate per tree DEPTH
(not per node), with per-node must/msm gates, must_not anti-joins,
and filter semi-joins. A composed node's passing docs become one item
row of its parent.

Documented deviations (all fail loudly, never silently approximate):
  * on a single packed index the leaf SCORING field key must be "text"
    (multi-field leaves + multi_match live on the fielded surface,
    query/fielded.py search_dsl_fielded); filter fields must be stored
    doc-values columns;
  * scoring leaves are not accepted in filter context (use must —
    identical matching, and the engine's scoring is the point), nor
    attribute leaves directly in must_not (use the filter-only-bool
    form above);
  * a filter-only bool under SHOULD is refused (it would contribute
    score 0 and drag a corpus-sized constant-score set through the
    plan; put it in must or must_not, where it compiles to a gate);
  * as in the flat path, a doc must match at least one SCORING clause
    to appear — a doc matching only filter context scores nothing and
    is not returned (except in the top-level filter-only page shape);
  * `match` decomposes into one clause per analyzed token (the module's
    standard decomposition, same as query_string multi-token segments),
    so match.operator is only honored at the TOP level, where it picks
    the tokens' role; inside a bool role it must be omitted/"or";
  * minimum_should_match is an integer (no ES percentage forms);
  * `term` must analyze to exactly one token (ES term queries are
    atomic; a multi-token value means the caller wanted `match`).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.localrel import inline_table, literal_map
from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.querystring import (
    _CAND_SCHEMA,
    Clause,
    _analyzed,
    _execute_clauses,
)

_LEAF_KINDS = (
    "match", "match_phrase", "term", "prefix", "wildcard", "regexp", "fuzzy"
)
# leaf kind -> (Clause kind, spec key carrying the text, extra option keys)
_LEAF_MAP = {
    "match": ("term", "query", ("operator",)),
    "match_phrase": ("phrase", "query", ("slop",)),
    "term": ("term", "value", ()),
    "prefix": ("prefix", "value", ()),
    "wildcard": ("wildcard", "value", ()),
    "regexp": ("regexp", "value", ()),
    "fuzzy": ("fuzzy", "value", ("fuzziness",)),
}


def _leaf_clauses(kind: str, body, role: str, allow_operator: bool,
                  fields: tuple = ("text",)):
    """One DSL leaf -> [Clause] (pre-analysis: texts still raw). fields:
    the index's analyzed field names — a single packed index exposes
    ("text",), the fielded DSL passes its sub-index names."""
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"{kind} must map exactly one field, got {body!r}")
    field, spec = next(iter(body.items()))
    if field not in fields:
        raise ValueError(
            f"unknown field {field!r} — this index has the analyzed "
            f"field(s) {sorted(fields)}"
        )
    ckind, text_key, extra_keys = _LEAF_MAP[kind]
    if isinstance(spec, str):
        spec = {text_key: spec}
    if not isinstance(spec, dict) or text_key not in spec:
        raise ValueError(f"{kind} needs {text_key!r} in {spec!r}")
    unknown = set(spec) - {text_key, "boost"} - set(extra_keys)
    if unknown:
        raise ValueError(f"unsupported {kind} options: {sorted(unknown)}")
    text = spec[text_key]
    if not isinstance(text, str) or not text.strip():
        raise ValueError(f"{kind} {text_key} must be a non-empty string")
    boost = float(spec.get("boost", 1.0))
    if boost <= 0:
        raise ValueError(f"boost must be positive, got {boost}")
    if kind == "match":
        op = spec.get("operator", "or")
        if op not in ("or", "and"):
            raise ValueError(f"match operator must be 'or' or 'and', got {op!r}")
        if op == "and" and not allow_operator:
            raise ValueError(
                "match.operator='and' inside a bool role is not supported — "
                "match decomposes per token here; put the match under "
                "bool.must instead"
            )
        role = "must" if (op == "and" and allow_operator) else role
        return [Clause(role, "term", text, boost, fieldname=field)]
    if kind == "match_phrase":
        slop = int(spec.get("slop", 0))
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        return [Clause(role, "phrase", text, boost, slop=slop,
                       fieldname=field)]
    if kind == "fuzzy":
        edits = int(spec.get("fuzziness", 2))
        if not 0 <= edits <= 2:
            raise ValueError(f"fuzziness must be 0..2, got {edits}")
        return [Clause(role, "fuzzy", text, boost, edits=edits,
                       fieldname=field)]
    return [Clause(role, ckind, text, boost, fieldname=field)]


_FILTER_KINDS = ("term", "terms", "range", "exists", "ids", "prefix",
                 "wildcard")
_RANGE_OPS = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}


def _like_escape(v: str) -> str:
    """Escape LIKE metacharacters in a literal fragment (backslash
    escape, shared by Spark and DuckDB with ESCAPE '\\')."""
    return v.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _is_scalar(v) -> bool:
    return isinstance(v, (str, int, float, bool))


def _filter_leaf(kind: str, body) -> dict:
    """One filter-context leaf -> normalized spec dict (index-free shape
    validation; field existence is checked at execution against the
    index's stored attrs)."""
    if kind not in _FILTER_KINDS:
        raise ValueError(
            f"unsupported filter leaf {kind!r} (supported: "
            f"{', '.join(_FILTER_KINDS)}; scoring leaves belong in must)"
        )
    if kind == "ids":
        if (not isinstance(body, dict) or set(body) != {"values"}
                or not isinstance(body["values"], list) or not body["values"]
                or not all(isinstance(v, str) for v in body["values"])):
            raise ValueError(
                f"ids filter needs {{'values': [doc_id, ...]}}, got {body!r}"
            )
        return {"kind": "ids", "values": sorted(set(body["values"]))}
    if kind == "exists":
        if not isinstance(body, dict) or set(body) != {"field"} \
                or not isinstance(body["field"], str):
            raise ValueError(
                f"exists filter needs {{'field': name}}, got {body!r}"
            )
        return {"kind": "exists", "field": body["field"]}
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"{kind} filter must map exactly one field, got {body!r}")
    field, spec = next(iter(body.items()))
    if kind in ("prefix", "wildcard"):
        if isinstance(spec, dict):
            if set(spec) != {"value"}:
                raise ValueError(
                    f"{kind} filter options: only 'value', got {spec!r}"
                )
            spec = spec["value"]
        if not isinstance(spec, str) or not spec:
            raise ValueError(
                f"{kind} filter value must be a non-empty string, got {spec!r}"
            )
        return {"kind": kind, "field": field, "value": spec}
    if kind == "term":
        if isinstance(spec, dict):
            if set(spec) != {"value"}:
                raise ValueError(f"term filter options: only 'value', got {spec!r}")
            spec = spec["value"]
        if not _is_scalar(spec):
            raise ValueError(f"term filter value must be a scalar, got {spec!r}")
        return {"kind": "term", "field": field, "value": spec}
    if kind == "terms":
        if not isinstance(spec, list) or not spec \
                or not all(_is_scalar(v) for v in spec):
            raise ValueError(
                f"terms filter needs a non-empty scalar list, got {spec!r}"
            )
        return {"kind": "terms", "field": field, "values": spec}
    # range
    if not isinstance(spec, dict) or not spec \
            or not set(spec) <= set(_RANGE_OPS) \
            or not all(_is_scalar(v) for v in spec.values()):
        raise ValueError(
            f"range filter needs {{gte/gt/lte/lt: scalar}}, got {spec!r}"
        )
    return {"kind": "range", "field": field,
            "bounds": {op: spec[op] for op in sorted(spec)}}


def _sql_lit(v) -> str:
    """Scalar -> Spark-SQL literal (bool before int: bool is an int
    subclass)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + v.replace("'", "''") + "'"


def _filter_sql(flt: dict, stored: tuple) -> str:
    """Normalized filter spec -> one SQL fragment over docmap columns.
    Deterministic text (sorted values/bounds) so identical filters on
    different queries dedupe to one docmap scan."""
    if flt["kind"] == "all":
        return "TRUE"
    if flt["kind"] == "ids":
        vals = ", ".join(_sql_lit(v) for v in flt["values"])
        return f"doc_id IN ({vals})"
    field = flt["field"]
    if field not in stored:
        raise ValueError(
            f"filter field {field!r} is not a stored doc-values column "
            f"(this index stores {sorted(stored)}; build_index store_attrs)"
        )
    col = f"`{field}`"
    if flt["kind"] == "exists":
        return f"{col} IS NOT NULL"
    if flt["kind"] in ("prefix", "wildcard"):
        if flt["kind"] == "prefix":
            pat = _like_escape(flt["value"]) + "%"
        else:
            pat = "".join(
                "%" if ch == "*" else "_" if ch == "?" else _like_escape(ch)
                for ch in flt["value"]
            )
        # the fragment feeds Spark's F.expr, whose string literals use
        # backslash escaping — double every backslash (the LIKE escape
        # char) and single quotes on the way into the literal
        lit = pat.replace("\\", "\\\\").replace("'", "''")
        return f"{col} LIKE '{lit}' ESCAPE '\\\\'"
    if flt["kind"] == "term":
        return f"{col} = {_sql_lit(flt['value'])}"
    if flt["kind"] == "terms":
        vals = ", ".join(_sql_lit(v) for v in sorted(set(flt["values"]), key=str))
        return f"{col} IN ({vals})"
    return " AND ".join(
        f"{col} {_RANGE_OPS[op]} {_sql_lit(v)}"
        for op, v in flt["bounds"].items()
    )


def compile_dsl(query: dict) -> tuple[list, int, list]:
    """One DSL dict -> (raw clauses, minimum_should_match, filters).
    Pure and deterministic; analysis happens later against the index
    analyzer, filter-field validation at execution against the index's
    stored attrs."""
    if not isinstance(query, dict) or len(query) != 1:
        raise ValueError(
            f"a DSL query maps exactly one query type, got {query!r}"
        )
    kind, body = next(iter(query.items()))
    if kind in _LEAF_KINDS:
        # a bare leaf at the top level scores whatever it matches
        return _leaf_clauses(kind, body, "should", allow_operator=True), 0, []
    if kind != "bool":
        raise ValueError(
            f"unsupported query type {kind!r} (supported: bool, "
            f"{', '.join(_LEAF_KINDS)})"
        )
    if not isinstance(body, dict):
        raise ValueError(f"bool body must be a dict, got {body!r}")
    unknown = set(body) - {
        "must", "should", "must_not", "filter", "minimum_should_match"
    }
    if unknown:
        raise ValueError(f"unsupported bool options: {sorted(unknown)}")
    msm = body.get("minimum_should_match", 0)
    _validate_msm_spec(msm)
    clauses: list = []
    for role in ("must", "should", "must_not"):
        entries = body.get(role, [])
        if isinstance(entries, dict):
            entries = [entries]
        for entry in entries:
            if not isinstance(entry, dict) or len(entry) != 1:
                raise ValueError(f"bool {role} entries must be single-key "
                                 f"query dicts, got {entry!r}")
            ekind, ebody = next(iter(entry.items()))
            if ekind == "bool":
                raise ValueError(
                    "compile_dsl is the FLAT compiler — nested bool "
                    "queries take _compile_bool_node / the item-"
                    "composition path (search_dsl routes them there)"
                )
            if ekind not in _LEAF_KINDS:
                raise ValueError(f"unsupported query type {ekind!r} in bool")
            clauses.extend(
                _leaf_clauses(ekind, ebody, role, allow_operator=False)
            )
    filters: list = []
    entries = body.get("filter", [])
    if isinstance(entries, dict):
        entries = [entries]
    for entry in entries:
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(f"bool filter entries must be single-key "
                             f"query dicts, got {entry!r}")
        fkind, fbody = next(iter(entry.items()))
        filters.append(_filter_leaf(fkind, fbody))
    if not clauses and not filters:
        raise ValueError("bool query has no clauses")
    return clauses, msm, filters


def _validate_msm_spec(spec) -> None:
    """minimum_should_match accepts ES's single forms: an integer
    (negative = that many should clauses may be missing) or a percentage
    string like '75%' / '-25%' (of the post-analysis should-clause count).
    ES's combination grammar ('3<90%') is not supported."""
    if isinstance(spec, int):
        return
    if isinstance(spec, str):
        s = spec.strip()
        if s.endswith("%"):
            try:
                float(s[:-1])
                return
            except ValueError:
                pass
    raise ValueError(
        f"minimum_should_match must be an integer or a percentage string, "
        f"got {spec!r}"
    )


def resolve_msm(spec, n_should: int) -> int:
    """ES minimum_should_match resolution against the actual number of
    should clauses (Lucene's spec): positive int = fixed quota; negative
    int = n_should + spec (that many optional clauses may be missing);
    'P%' = floor(P/100 · n_should); '-P%' = n_should − floor(P/100 ·
    n_should). Floored at 0; a quota ABOVE n_should is kept as-is and is
    structurally unsatisfiable (Lucene: such a query matches nothing —
    the same rule search_boolean documents)."""
    import math

    if isinstance(spec, int):
        m = spec if spec >= 0 else n_should + spec
    else:
        pct = float(spec.strip()[:-1])
        part = math.floor(abs(pct) / 100.0 * n_should)
        m = part if pct >= 0 else n_should - part
    return max(0, int(m))


# ---------------------------------------------------------------------
# nested bool: item-composition path (module docstring, "bool NESTS")
# ---------------------------------------------------------------------

_GLUE = "\x1e"  # pseudo-query-id glue: "<query_id>\x1e<item_id>"

# nested-level checkpoint gate: a level may skip its localCheckpoint only
# when the batch is small AND the index is at most this many docs — the
# checkpoint costs one fixed job round, the skipped checkpoint costs
# re-running the level's subplan once per lower level, which scales with
# corpus size (see _execute_tree / search_dsl_fielded).
_CHECKPOINT_SMALL_DOCS = 200_000


class _BoolNode:
    """One bool in the query tree. clause_items / bool_items are
    (item_id, role, payload) with role ∈ must/should/must_not; filters
    and anti_filters hold normalized filter-leaf spec lists (each inner
    list one conjunction); const_bonus is the summed constant_score /
    match_all must-context boost added to every passing doc's score."""

    __slots__ = ("node_id", "depth", "clause_items", "bool_items",
                 "filters", "anti_filters", "n_must", "msm", "const_bonus",
                 "combine", "tie_breaker", "boost")

    def __init__(self, node_id: int, depth: int):
        self.node_id = node_id
        self.depth = depth
        self.clause_items: list = []
        self.bool_items: list = []
        self.filters: list = []
        self.anti_filters: list = []
        self.n_must = 0
        self.msm = 0
        self.const_bonus = 0.0
        self.combine = "bool"      # 'bool' (sum) | 'dis_max'
        self.tie_breaker = 0.0     # dis_max only
        self.boost = 1.0           # multiplies the node's final score


_TREE_KINDS = ("bool", "constant_score", "match_all", "dis_max")


def has_nested_bool(qdict: dict) -> bool:
    """True when the query dict needs the item-composition path: a
    constant_score / match_all / dis_max anywhere, or a bool inside a
    bool role."""
    if not isinstance(qdict, dict) or len(qdict) != 1:
        return False
    kind, body = next(iter(qdict.items()))
    if kind in ("constant_score", "match_all", "dis_max"):
        return True
    if kind != "bool" or not isinstance(body, dict):
        return False
    if "boost" in body:
        # bool.boost only exists on the tree path
        return True
    for role in ("must", "should", "must_not"):
        entries = body.get(role, [])
        entries = [entries] if isinstance(entries, dict) else entries
        for e in entries:
            if (isinstance(e, dict) and len(e) == 1
                    and next(iter(e)) in _TREE_KINDS):
                return True
    return False


def _parse_constant_score(body) -> tuple[list, float]:
    """constant_score body -> (filter conjunction specs, boost). filter
    accepts one attribute leaf, a list of them, or a filter-only bool."""
    if not isinstance(body, dict) or "filter" not in body \
            or not set(body) <= {"filter", "boost"}:
        raise ValueError(
            f"constant_score needs {{'filter': ..., 'boost'?: b}}, "
            f"got {body!r}"
        )
    boost = float(body.get("boost", 1.0))
    if boost <= 0:
        raise ValueError(f"boost must be positive, got {boost}")
    flt = body["filter"]
    entries = flt if isinstance(flt, list) else [flt]
    specs: list = []
    for entry in entries:
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(
                f"constant_score filter entries must be single-key query "
                f"dicts, got {entry!r}"
            )
        fkind, fbody = next(iter(entry.items()))
        if fkind == "bool":
            if not isinstance(fbody, dict) or set(fbody) != {"filter"}:
                raise ValueError(
                    "a bool inside constant_score.filter must be "
                    "filter-only (scoring there would be discarded anyway)"
                )
            inner = fbody["filter"]
            inner = inner if isinstance(inner, list) else [inner]
            for ie in inner:
                ik, ib = next(iter(ie.items()))
                specs.append(_filter_leaf(ik, ib))
        else:
            specs.append(_filter_leaf(fkind, fbody))
    if not specs:
        raise ValueError("constant_score filter is empty")
    return specs, boost


def _compile_dismax_node(body, analyzer: str, ctx: "_TreeCtx",
                         depth: int,
                         fields: tuple = ("text",)) -> _BoolNode:
    """ES dis_max: score = max(branch scores) + tie_breaker × (sum of
    the other matched branches); a doc matches when any branch matches.
    Each queries[] entry is ONE branch — a leaf that analyzes to several
    clauses (multi-token match) wraps in an implicit bool so its tokens
    sum INSIDE the branch before the max."""
    if not isinstance(body, dict) or "queries" not in body \
            or not set(body) <= {"queries", "tie_breaker"}:
        raise ValueError(
            f"dis_max needs {{'queries': [...], 'tie_breaker'?: t}}, "
            f"got {body!r}"
        )
    tb = float(body.get("tie_breaker", 0.0))
    if not 0.0 <= tb <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tb}")
    entries = body["queries"]
    if not isinstance(entries, list) or not entries:
        raise ValueError("dis_max queries must be a non-empty list")
    node = _BoolNode(ctx.node(), depth)
    node.combine = "dis_max"
    node.tie_breaker = tb
    for entry in entries:
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(f"dis_max queries entries must be single-key "
                             f"query dicts, got {entry!r}")
        ekind, ebody = next(iter(entry.items()))
        if ekind == "bool":
            child = _compile_bool_node(ebody, analyzer, ctx, depth + 1,
                                       fields=fields)
            if child is None:
                continue  # the branch analyzed to nothing and vanishes
            if not child.clause_items and not child.bool_items:
                raise ValueError(
                    "a filter-only bool cannot be a dis_max branch (it "
                    "contributes no score to maximize)"
                )
            node.bool_items.append((ctx.item(), "should", child))
        elif ekind == "dis_max":
            child = _compile_dismax_node(ebody, analyzer, ctx, depth + 1,
                                         fields=fields)
            if child is None:
                continue
            node.bool_items.append((ctx.item(), "should", child))
        elif ekind in _LEAF_KINDS:
            raws = _leaf_clauses(ekind, ebody, "should",
                                 allow_operator=False, fields=fields)
            a = (analyzer[raws[0].fieldname]
                 if isinstance(analyzer, dict) else analyzer)
            cs = _analyzed(raws, a, ctx.tok_cache)
            if len(cs) == 1:
                node.clause_items.append((ctx.item(), "should", cs[0]))
            elif len(cs) > 1:
                sub = _BoolNode(ctx.node(), depth + 1)
                sub.clause_items = [(ctx.item(), "should", c) for c in cs]
                node.bool_items.append((ctx.item(), "should", sub))
            # len 0: the branch analyzed to nothing and vanishes (the
            # flat path's empty-clause rule)
        else:
            raise ValueError(
                f"unsupported query type {ekind!r} in dis_max (scoring "
                "queries only — constant_score/match_all belong in bool)"
            )
    if not node.clause_items and not node.bool_items:
        # every branch analyzed to nothing: the dis_max vanishes (the
        # flat path's empty-clause rule lifted to the whole node)
        return None
    return node


def _parse_match_all(body) -> float:
    """match_all body -> boost (ES: every doc matches at `boost`)."""
    if body is None:
        body = {}
    if not isinstance(body, dict) or not set(body) <= {"boost"}:
        raise ValueError(f"match_all options: only 'boost', got {body!r}")
    boost = float(body.get("boost", 1.0))
    if boost <= 0:
        raise ValueError(f"boost must be positive, got {boost}")
    return boost


class _TreeCtx:
    """Per-query id allocator (items and nodes share nothing).
    tok_cache: optional {(analyzer, text) -> tokens} memo filled
    executor-side for huge batches (_distributed_tok_cache)."""

    def __init__(self, tok_cache: dict | None = None):
        self.next_item = 0
        self.next_node = 0
        self.tok_cache = tok_cache

    def item(self) -> int:
        i = self.next_item
        self.next_item += 1
        return i

    def node(self) -> int:
        n = self.next_node
        self.next_node += 1
        return n


def _compile_bool_node(body, analyzer: str, ctx: _TreeCtx,
                       depth: int,
                       fields: tuple = ("text",)) -> _BoolNode:
    """One bool body -> _BoolNode (recursive). Leaves analyze here so
    item counts (and therefore msm resolution and must gating) see the
    post-analysis clause set — the flat path's exact rule."""
    if not isinstance(body, dict):
        raise ValueError(f"bool body must be a dict, got {body!r}")
    unknown = set(body) - {
        "must", "should", "must_not", "filter", "minimum_should_match",
        "boost",
    }
    if unknown:
        raise ValueError(f"unsupported bool options: {sorted(unknown)}")
    msm_spec = body.get("minimum_should_match", 0)
    _validate_msm_spec(msm_spec)
    node = _BoolNode(ctx.node(), depth)
    node.boost = float(body.get("boost", 1.0))
    if node.boost <= 0:
        raise ValueError(f"boost must be positive, got {node.boost}")
    n_entries = 0
    for role in ("must", "should", "must_not"):
        entries = body.get(role, [])
        if isinstance(entries, dict):
            entries = [entries]
        for entry in entries:
            if not isinstance(entry, dict) or len(entry) != 1:
                raise ValueError(f"bool {role} entries must be single-key "
                                 f"query dicts, got {entry!r}")
            ekind, ebody = next(iter(entry.items()))
            n_entries += 1
            if ekind == "bool":
                child = _compile_bool_node(ebody, analyzer, ctx, depth + 1,
                                       fields=fields)
                if child is None:
                    # the child's clauses all analyzed away: like the
                    # flat path's vanished clauses, it imposes nothing
                    continue
                if not child.clause_items and not child.bool_items:
                    # filter-only bool: compile-time rewrite to a gate
                    if role == "must":
                        node.filters.extend(child.filters)
                        node.anti_filters.extend(child.anti_filters)
                        node.const_bonus += child.const_bonus * child.boost
                    elif role == "must_not":
                        if child.anti_filters:
                            raise ValueError(
                                "a filter-only bool under must_not cannot "
                                "itself carry must_not filter rewrites — "
                                "flatten the negation"
                            )
                        # the child's conjunctions all had to pass, so the
                        # negation is NOT(AND of every spec) — one flat
                        # conjunction (a constant bonus on an excluded doc
                        # is irrelevant and drops)
                        node.anti_filters.append(
                            [f for fs in child.filters for f in fs]
                        )
                    else:
                        raise ValueError(
                            "a filter-only bool under should is refused: it "
                            "would drag a corpus-sized constant-score set "
                            "through the plan — put it under must (gate) "
                            "or must_not (exclusion)"
                        )
                else:
                    node.bool_items.append((ctx.item(), role, child))
                continue
            if ekind == "constant_score":
                specs, boost = _parse_constant_score(ebody)
                if role == "must":
                    node.filters.append(specs)
                    node.const_bonus += boost
                elif role == "must_not":
                    node.anti_filters.append(specs)
                else:
                    raise ValueError(
                        "constant_score under should is refused: it would "
                        "drag a corpus-sized constant-score set through the "
                        "plan — put it under must (gate + fixed bonus) or "
                        "must_not (exclusion)"
                    )
                continue
            if ekind == "dis_max":
                child = _compile_dismax_node(ebody, analyzer, ctx, depth + 1,
                                         fields=fields)
                if child is None:
                    continue
                node.bool_items.append((ctx.item(), role, child))
                continue
            if ekind == "match_all":
                boost = _parse_match_all(ebody)
                if role != "must":
                    raise ValueError(
                        "match_all only composes under must (a fixed bonus "
                        "on every passing doc) or at the top level (the "
                        "full-corpus page)"
                    )
                node.filters.append([{"kind": "all"}])
                node.const_bonus += boost
                continue
            if ekind not in _LEAF_KINDS:
                raise ValueError(f"unsupported query type {ekind!r} in bool")
            raws = _leaf_clauses(ekind, ebody, role, allow_operator=False,
                                 fields=fields)
            # per-field analyzers (fielded surface): analyzer may be a
            # {field: analyzer} dict; one leaf targets one field
            a = (analyzer[raws[0].fieldname]
                 if isinstance(analyzer, dict) else analyzer)
            for c in _analyzed(raws, a, ctx.tok_cache):
                node.clause_items.append((ctx.item(), c.role, c))
    entries = body.get("filter", [])
    if isinstance(entries, dict):
        entries = [entries]
    fspecs = []
    for entry in entries:
        if not isinstance(entry, dict) or len(entry) != 1:
            raise ValueError(f"bool filter entries must be single-key "
                             f"query dicts, got {entry!r}")
        fkind, fbody = next(iter(entry.items()))
        fspecs.append(_filter_leaf(fkind, fbody))
    if fspecs:
        node.filters.append(fspecs)
    if (not node.clause_items and not node.bool_items
            and not node.filters and not node.anti_filters):
        if n_entries:
            # every written clause analyzed to nothing (e.g. all
            # stopwords): the bool VANISHES — flat-path parity, where
            # analysis-emptied clauses drop silently and an all-empty
            # query matches nothing
            return None
        raise ValueError("bool query has no clauses")
    node.n_must = sum(
        1 for (_, r, _) in node.clause_items + node.bool_items if r == "must"
    )
    n_should = sum(
        1 for (_, r, _) in node.clause_items + node.bool_items
        if r == "should"
    )
    node.msm = resolve_msm(msm_spec, n_should) if msm_spec else 0
    return node


def _walk_nodes(node: _BoolNode):
    yield node
    for (_, _, child) in node.bool_items:
        yield from _walk_nodes(child)


def _execute_tree(
    index: BM25Index,
    roots: dict,
    k: int,
    max_expansions: int,
    fuzzy_prefix_len: int,
) -> DataFrame:
    """Execute compiled trees ({query_id: _BoolNode}) and return the
    finalized run. One shared clause plan for every leaf item, then one
    composition aggregate per tree DEPTH (module docstring)."""
    from openmatch_spark.query.phrase import _finalize

    spark = index.spark
    for qid in roots:
        if _GLUE in qid:
            raise ValueError(
                f"query_id {qid!r} contains the reserved separator U+001E"
            )

    # ---- leaf items -> one shared clause plan ----
    clause_pq: dict = {}
    for qid, root in sorted(roots.items()):
        for node in _walk_nodes(root):
            for (iid, _, c) in node.clause_items:
                clause_pq[f"{qid}{_GLUE}{iid}"] = [
                    Clause("should", c.kind, c.text, c.boost,
                           slop=c.slop, edits=c.edits, tokens=c.tokens)
                ]
    cand = _execute_clauses(
        index, clause_pq, k, {}, max_expansions, fuzzy_prefix_len,
        finalize=False,
    )
    # the item candidate set is referenced by every composition level;
    # checkpoint it so the clause plan executes ONCE and each level's
    # plan stays compact (it is posting-bounded — small relative to the
    # corpus — so materializing it is cheap at any scale)
    items = cand.select(
        F.substring_index("query_id", _GLUE, 1).alias("query_id"),
        F.substring_index("query_id", _GLUE, -1).cast("int").alias("iid"),
        "shard", "doc_ord", "score",
    ).localCheckpoint()

    # ---- filter gates: distinct conjunctions -> one docmap scan each ----
    fids: dict = {}
    fmap_rows: list = []   # (qid, node_id, fid) — semi-join gates
    amap_rows: list = []   # (qid, node_id, fid) — anti-join gates
    need_attrs = False
    for qid, root in sorted(roots.items()):
        for node in _walk_nodes(root):
            if any(f["kind"] not in ("ids", "all")
                   for fspecs in node.filters + node.anti_filters
                   for f in fspecs):
                need_attrs = True
                if not index.stored_attrs:
                    break
            if node.filters:
                # every conjunction must pass -> AND them into ONE
                # predicate (one docmap scan, one semi-join per node);
                # 'all' specs (match_all) are vacuous alongside real ones
                specs = [f for fspecs in node.filters for f in fspecs]
                real = [f for f in specs if f["kind"] != "all"]
                sql = " AND ".join(
                    f"({_filter_sql(f, index.stored_attrs)})" for f in real
                ) if real else "TRUE"
                zero = (not node.clause_items and not node.bool_items
                        and node.depth == 0)
                if real or zero:
                    # a TRUE gate is a no-op for scoring nodes; zero
                    # roots keep it as the page's scan predicate
                    fmap_rows.append(
                        (qid, node.node_id, fids.setdefault(sql, len(fids)))
                    )
            for fspecs in node.anti_filters:
                # each anti conjunction excludes independently (NOT (f1
                # AND f2 ...) per must_not entry) — keep them separate
                sql = " AND ".join(
                    f"({_filter_sql(f, index.stored_attrs)})" for f in fspecs
                )
                amap_rows.append(
                    (qid, node.node_id, fids.setdefault(sql, len(fids)))
                )
    if need_attrs and not index.stored_attrs:
        raise ValueError(
            "bool.filter needs stored doc values, but this index was built "
            "without store_attrs (ids filters work on any index)"
        )
    allowed = None
    for sql, fid in sorted(fids.items(), key=lambda kv: kv[1]):
        a = index.docmap.where(F.expr(sql)).select(
            F.lit(fid).cast("int").alias("fid"), "shard", "doc_ord", "doc_id"
        )
        allowed = a if allowed is None else allowed.unionByName(a)
    if allowed is not None:
        # tombstones must come out BEFORE the zero-roots row_number cut
        # below — mask_deleted's contract is "before any rank/top-k cut",
        # and a deleted doc must not consume a filter-only page slot
        allowed = index.mask_deleted(allowed)

    # roots left with NO scoring items after the rewrites (filter-only
    # shapes) take the flat path's zero-score page semantics: the k
    # first passing docs by doc_id at score 0.0
    zero_roots = {
        qid: root for qid, root in sorted(roots.items())
        if not root.clause_items and not root.bool_items
    }
    for qid, root in zero_roots.items():
        if not root.filters:
            raise ValueError(
                f"query {qid!r} reduces to a pure negation — give it a "
                "positive filter context (or a scoring clause)"
            )

    # ---- compose bottom-up, one aggregate pass per depth ----
    max_depth = max(
        node.depth for root in roots.values() for node in _walk_nodes(root)
    )
    item_src = items
    root_out = None
    for depth in range(max_depth, -1, -1):
        level = [
            (qid, node) for qid, root in sorted(roots.items())
            for node in _walk_nodes(root) if node.depth == depth
        ]
        meta_rows = [
            (qid, iid, node.node_id, role)
            for (qid, node) in level
            for (iid, role, _) in node.clause_items + node.bool_items
        ]
        gate_rows = [
            (qid, node.node_id, node.n_must, node.msm,
             float(node.const_bonus),
             int(node.combine == "dis_max"), float(node.tie_breaker),
             float(node.boost))
            for (qid, node) in level
        ]
        # per-level metadata is one-to-one on its key ((query_id, iid)
        # for item->node/role, (query_id, node) for the gate params), so
        # both ride as literal maps: element_at + isNotNull is the same
        # inner equi-join without a broadcast-stage job per table per
        # depth. Key glue is _GLUE, which query_ids are validated not to
        # contain.
        meta_m = literal_map(
            {f"{q}{_GLUE}{i}": (n, r) for (q, i, n, r) in meta_rows},
            "string", "node int, role string",
        )
        gates_m = literal_map(
            {f"{q}{_GLUE}{n}": rest for (q, n, *rest) in gate_rows},
            "string",
            "n_must int, msm int, bonus double,"
            " dismax int, tb double, mult double",
        )
        # ONE aggregate per level: must_not membership rides the same
        # groupBy as a count (a matched must_not item disqualifies the
        # doc; its score is excluded from the sum), and the positive-
        # match contract (a doc must match >= 1 scoring item) is the
        # must_m + should_m >= 1 conjunct
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
                "query_id", "iid", "shard", "doc_ord", "score",
                F.col("_mt.node").alias("node"),
                F.col("_mt.role").alias("role"),
            )
            .groupBy("query_id", "node", "shard", "doc_ord")
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
                "query_id", "node", "shard", "doc_ord",
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
        lvl_fmap = [(q, n, f) for (q, n, f) in fmap_rows
                    if (q, n) in level_keys]
        if lvl_fmap:
            # single-pass gate: rows of unfiltered nodes carry a NULL
            # fid and pass; filtered nodes need a probe hit
            fm_m = literal_map(
                {f"{q}{_GLUE}{n}": f for (q, n, f) in lvl_fmap},
                "string", "fid int",
            )
            probe = allowed.select(
                "fid", "shard", "doc_ord", F.lit(1).alias("_fhit")
            )
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
                .join(probe, ["fid", "shard", "doc_ord"], "left")
                .where(F.col("fid").isNull() | F.col("_fhit").isNotNull())
                .select("query_id", "node", "shard", "doc_ord", "score")
            )
        lvl_amap = [(q, n, f) for (q, n, f) in amap_rows
                    if (q, n) in level_keys]
        if lvl_amap:
            am = F.broadcast(inline_table(spark, 
                lvl_amap, "query_id string, node int, fid int"
            ))
            excl = am.join(allowed, "fid").select(
                "query_id", "node", "shard", "doc_ord"
            )
            res = res.join(excl, ["query_id", "node", "shard", "doc_ord"],
                           "left_anti")
        if depth == 0:
            root_out = res.select("query_id", "shard", "doc_ord", "score")
            if zero_roots:
                zfmap = {q: f for (q, n, f) in fmap_rows if q in zero_roots}
                zm = F.broadcast(inline_table(spark, 
                    [(q, f,
                      float(zero_roots[q].const_bonus * zero_roots[q].boost))
                     for q, f in sorted(zfmap.items())],
                    "query_id string, fid int, bonus double",
                ))
                zp = zm.join(allowed, "fid")
                zamap = [(q, f) for (q, n, f) in amap_rows if q in zero_roots]
                if zamap:
                    za = F.broadcast(inline_table(spark, 
                        zamap, "query_id string, fid int"
                    ))
                    excl = za.join(
                        allowed.select("fid", "shard", "doc_ord"), "fid"
                    ).select("query_id", "shard", "doc_ord")
                    zp = zp.join(excl, ["query_id", "shard", "doc_ord"],
                                 "left_anti")
                wz = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
                zp = (
                    zp.withColumn("_r", F.row_number().over(wz))
                    .where(F.col("_r") <= k)
                    .select("query_id", "shard", "doc_ord",
                            F.col("bonus").alias("score"))
                )
                root_out = root_out.unionByName(zp)
        else:
            # composed nodes become one item row of their parent;
            # checkpoint the (small, post-gate) level result so LOWER
            # levels' plans do not re-embed this one — except at depth 1,
            # where only the root remains and references it exactly once
            # (a checkpoint there is a pure extra materialization job)
            parent_map = [
                (qid, child.node_id, iid)
                for qid, root in sorted(roots.items())
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
                "query_id", "iid", "shard", "doc_ord", "score"
            )
            if depth > 1 and (
                len(roots) > 64
                or sum(index._manifest_counts().values())
                > _CHECKPOINT_SMALL_DOCS
            ):
                # materialize the (post-gate, small) level so lower
                # levels' plans do not re-embed it — without this the
                # deepest level's subplan is duplicated once per lower
                # level. Skipped only when BOTH the batch and the index
                # are small: the checkpoint's job round is a fixed
                # ~0.1 s, while the re-embedded aggregate's recompute
                # cost scales with corpus size, so on big indexes the
                # checkpoint always wins (results identical either way).
                conv = conv.localCheckpoint()
            item_src = item_src.unionByName(conv)
    return _finalize(index, root_out, k, [])


def _leaf_texts(query: dict) -> list:
    """Best-effort walk of a DSL dict for (field, text) pairs of every
    scoring leaf whose compile will TOKENIZE its text (match,
    match_phrase, fuzzy, prefix, term — wildcard/regexp bodies are
    regex-cleaned, never analyzed). Filter context is skipped (attribute
    predicates, not analyzed text). Best-effort is safe: a text this
    walker misses simply falls back to the driver tokenizer
    (querystring._tokens_cached), it cannot change results."""
    out = []
    if not isinstance(query, dict) or len(query) != 1:
        return out
    kind, body = next(iter(query.items()))
    if kind in ("match", "match_phrase", "fuzzy", "prefix", "term"):
        if isinstance(body, dict) and len(body) == 1:
            fld, spec = next(iter(body.items()))
            key = _LEAF_MAP[kind][1]
            v = spec if isinstance(spec, str) else (
                spec.get(key) if isinstance(spec, dict) else None
            )
            if isinstance(v, str):
                out.append((fld, v))
    elif kind == "bool" and isinstance(body, dict):
        for role in ("must", "should", "must_not"):
            rs = body.get(role, [])
            rs = [rs] if isinstance(rs, dict) else rs
            for e in rs:
                if isinstance(e, dict):
                    out.extend(_leaf_texts(e))
    elif kind == "dis_max" and isinstance(body, dict):
        for e in body.get("queries", []) or []:
            if isinstance(e, dict):
                out.extend(_leaf_texts(e))
    elif kind == "multi_match" and isinstance(body, dict):
        # the fielded surface rewrites multi_match to per-field leaves
        # (fielded.rewrite_multi_match) — pre-warm those texts too
        v = body.get("query")
        if isinstance(v, str):
            for fld in body.get("fields", []) or []:
                if isinstance(fld, str):
                    out.append((fld.split("^", 1)[0], v))
    return out


def _distributed_tok_cache(
    queries: DataFrame,
    analyzers: dict,
    distributed_threshold: int | None = None,
):
    """(queries_dict, tok_cache) for a DataFrame(query_id, dsl) batch.

    Small batches (the rule-table regime) return (parsed dicts, None) —
    zero extra Spark jobs, compile tokenizes driver-side as before.
    Above the engine-wide threshold (bm25_search's
    _DISTRIBUTED_TOKENIZE_MIN_QUERIES), the expensive per-clause
    TOKENIZATION fans out to executors: one mapInPandas pass parses the
    JSON and emits each scoring leaf's (analyzer, text), and the DISTINCT
    pair set — bounded by distinct clause texts, not batch size — is
    tokenized with the same JVM/Arrow column tokenizer the plain path
    uses (query_term_counts) and collected as a {(analyzer, text) ->
    tokens} memo. Driver-side compile then walks dicts doing cache
    lookups instead of O(batch x clauses) Python tokenizer calls —
    mirroring bm25_search.py's scale discipline on the DSL front door.
    analyzers: {field -> analyzer} ({"text": a} for the single index)."""
    from openmatch_spark.query.bm25_search import (
        _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    )
    from openmatch_spark.session import scoped_confs

    if distributed_threshold is None:
        distributed_threshold = _DISTRIBUTED_TOKENIZE_MIN_QUERIES
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "dsl"
    )
    sess = q.sparkSession
    with scoped_confs(
        sess,
        {
            "spark.sql.limit.initialNumPartitions": str(
                max(sess.sparkContext.defaultParallelism, 16)
            )
        },
    ):
        head = q.take(distributed_threshold + 1)
    if len(head) <= distributed_threshold:
        return {str(r["query_id"]): json.loads(r["dsl"]) for r in head}, None

    fmap = dict(analyzers)

    def _texts_part(it):
        import json as _json

        import pandas as pd

        from openmatch_spark.query.dsl import _leaf_texts as walk

        for pdf in it:
            a_out, t_out = [], []
            for s in pdf["dsl"]:
                try:
                    d = _json.loads(s)
                except (TypeError, ValueError):
                    continue  # the driver-side parse below raises properly
                for fld, text in walk(d):
                    a = fmap.get(fld)
                    if a is not None:
                        a_out.append(a)
                        t_out.append(text)
            yield pd.DataFrame({"analyzer": a_out, "text": t_out})

    from openmatch_spark.analysis import tokenize_col

    pairs = q.mapInPandas(
        _texts_part, "analyzer string, text string"
    ).distinct()
    cache: dict = {}
    for a in sorted(set(fmap.values())):
        for r in pairs.where(F.col("analyzer") == a).select(
            "text", tokenize_col(F.col("text"), a).alias("toks")
        ).collect():
            cache[(a, r["text"])] = tuple(r["toks"])
    # the full batch still materializes driver-side (compiled clause rows
    # become broadcast tables either way) — but json.loads is C-speed;
    # the Python-tokenizer hot loop is what the cache removes
    rows = q.collect()
    return {str(r["query_id"]): json.loads(r["dsl"]) for r in rows}, cache


def search_dsl(
    index: BM25Index,
    queries,
    k: int = 100,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
    distributed_threshold: int | None = None,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) for ES-DSL query dicts.

    queries: {query_id: dsl_dict} — or a DataFrame(query_id, dsl) whose
    dsl column holds the JSON text (the CLI shape). Compilation is
    driver-side for rule-table-sized batches; a DataFrame batch above the
    engine-wide distributed threshold pre-tokenizes its clause texts
    executor-side (_distributed_tok_cache). Execution is the query_string
    surface's single declarative plan, plus — when any query carries a
    bool.filter — one column-pruned docmap scan per DISTINCT filter
    predicate and one (shard, doc_ord) semi-join over the candidate set
    before the top-k cut (module docstring)."""
    spark = index.spark
    analyzer = index.stats["analyzer"]
    tok_cache = None
    if isinstance(queries, DataFrame):
        queries, tok_cache = _distributed_tok_cache(
            queries, {"text": analyzer}, distributed_threshold
        )

    # term atomicity holds at every depth (ES term queries are atomic)
    from openmatch_spark.query.querystring import _tokens_cached

    def tokenize_py(text, a):
        return _tokens_cached(text, a, tok_cache)

    for qid, qdict in sorted(queries.items()):
        for v in _collect_term_values(qdict):
            toks = tokenize_py(v, analyzer)
            if len(toks) != 1:
                raise ValueError(
                    f"term value {v!r} analyzes to {len(toks)} tokens — "
                    "use match for multi-token text"
                )

    nested = {str(q): d for q, d in queries.items() if has_nested_bool(d)}
    if nested:
        trees = {}
        for qid, qdict in sorted(nested.items()):
            kind = next(iter(qdict))
            # top-level constant_score / match_all: the must-of-one form
            body = (qdict["bool"] if kind == "bool"
                    else {"must": [qdict]})
            root = _compile_bool_node(body, analyzer, _TreeCtx(tok_cache), 0)
            if root is not None:  # None: everything analyzed away
                trees[qid] = root
        nested_run = (
            _execute_tree(index, trees, k, max_expansions, fuzzy_prefix_len)
            if trees else spark.createDataFrame(
                [], "query_id string, doc_id string, score double, rank int"
            )
        )
        flat_qs = {q: d for q, d in queries.items() if str(q) not in nested}
        if not flat_qs:
            return nested_run
        flat_run = _search_dsl_flat(
            index, flat_qs, k, max_expansions, fuzzy_prefix_len, tok_cache
        )
        return flat_run.unionByName(nested_run)
    return _search_dsl_flat(
        index, queries, k, max_expansions, fuzzy_prefix_len, tok_cache
    )


def _search_dsl_flat(
    index: BM25Index,
    queries: dict,
    k: int,
    max_expansions: int,
    fuzzy_prefix_len: int,
    tok_cache: dict | None = None,
) -> DataFrame:
    """Flat-DSL execution (no nested bools): compile each dict with
    compile_dsl, analyze clauses (through the optional executor-filled
    token cache), then the shared clause executor + filter gating."""
    spark = index.spark
    analyzer = index.stats["analyzer"]

    per_q: dict = {}
    msm_by_q: dict = {}
    fsql_by_q: dict = {}
    for qid, qdict in sorted(queries.items()):
        raw, msm, filters = compile_dsl(qdict)
        per_q[str(qid)] = _analyzed(raw, analyzer, tok_cache)
        if filters:
            if not index.stored_attrs and any(
                f["kind"] != "ids" for f in filters
            ):
                raise ValueError(
                    "bool.filter needs stored doc values, but this index "
                    "was built without store_attrs (ids filters work on "
                    "any index)"
                )
            fsql_by_q[str(qid)] = " AND ".join(
                f"({_filter_sql(f, index.stored_attrs)})" for f in filters
            )
        if msm:
            # resolve percentage/negative forms against the POST-analysis
            # should-clause count (a multi-token match is several clauses)
            n_should = sum(
                1 for c in per_q[str(qid)] if c.role == "should"
            )
            resolved = resolve_msm(msm, n_should)
            if resolved:
                msm_by_q[str(qid)] = resolved
    if not fsql_by_q:
        return _execute_clauses(
            index, per_q, k, msm_by_q, max_expansions, fuzzy_prefix_len
        )

    from openmatch_spark.query.phrase import _finalize

    scoring_q = {q: cs for q, cs in per_q.items() if cs}
    # filter-only bools: no scoring clause compiled (compile_dsl
    # guarantees they carry filters) — the match_all-in-filter shape
    zero_qids = sorted(q for q, cs in per_q.items()
                       if not cs and q in fsql_by_q)
    cand = (
        _execute_clauses(index, scoring_q, k, msm_by_q, max_expansions,
                         fuzzy_prefix_len, finalize=False)
        if scoring_q else spark.createDataFrame([], _CAND_SCHEMA)
    )
    # distinct predicates evaluated once per batch: fid = predicate id
    fids: dict[str, int] = {}
    qmap_rows = []
    for qid, sql in sorted(fsql_by_q.items()):
        fid = fids.setdefault(sql, len(fids))
        qmap_rows.append((qid, fid))
    allowed = None
    for sql, fid in sorted(fids.items(), key=lambda kv: kv[1]):
        a = index.docmap.where(F.expr(sql)).select(
            F.lit(fid).cast("int").alias("fid"), "shard", "doc_ord", "doc_id"
        )
        allowed = a if allowed is None else allowed.unionByName(a)
    if allowed is not None:
        # tombstones out BEFORE the zero_qids row_number cut below —
        # a deleted doc must not consume a filter-only page slot
        allowed = index.mask_deleted(allowed)
    qmap = F.broadcast(
        inline_table(spark, qmap_rows, "query_id string, fid int")
    )
    gated = (
        cand.join(qmap, "query_id")
        .join(allowed, ["fid", "shard", "doc_ord"], "left_semi")
        .select("query_id", "shard", "doc_ord", "score")
    )
    out = cand.join(qmap, "query_id", "left_anti").unionByName(gated)
    if zero_qids:
        zmap = F.broadcast(inline_table(spark, 
            [(q, fids[fsql_by_q[q]]) for q in zero_qids],
            "query_id string, fid int",
        ))
        wz = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
        zeros = (
            zmap.join(allowed, "fid")
            # bound the scoreless candidate set to k per query BEFORE the
            # union — _finalize's rank() pre-cut cannot reduce an
            # all-ties set, and this is the cut it would make anyway
            # (score DESC then doc_id ASC over equal scores)
            .withColumn("_r", F.row_number().over(wz))
            .where(F.col("_r") <= k)
            .select("query_id", "shard", "doc_ord",
                    F.lit(0.0).alias("score"))
        )
        out = out.unionByName(zeros)
    return _finalize(index, out, k, [])


def _collect_term_values(query: dict) -> list:
    """All scoring `term` leaf values in a DSL dict, at any nesting
    depth (for atomicity validation). Filter-context term leaves are
    attribute predicates, not analyzed text — excluded."""
    if not isinstance(query, dict) or len(query) != 1:
        return []
    out = []
    kind, body = next(iter(query.items()))
    if kind == "term" and isinstance(body, dict):
        spec = next(iter(body.values()), None)
        v = spec if isinstance(spec, str) else (
            spec.get("value") if isinstance(spec, dict) else None
        )
        if isinstance(v, str):
            out.append(v)
    elif kind == "bool" and isinstance(body, dict):
        for role in ("must", "should", "must_not"):
            rs = body.get(role, [])
            rs = [rs] if isinstance(rs, dict) else rs
            for e in rs:
                if isinstance(e, dict):
                    out.extend(_collect_term_values(e))
    elif kind == "dis_max" and isinstance(body, dict):
        # mirror fielded.py's _term_field_values — a term inside dis_max
        # is held to the same one-token atomicity rule
        for e in body.get("queries", []) or []:
            if isinstance(e, dict):
                out.extend(_collect_term_values(e))
    return out


def explain_dsl(
    index: BM25Index,
    queries: dict,
    doc_ids,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
) -> DataFrame:
    """ES `_explain`-style per-clause breakdown: for each (query, doc in
    doc_ids) pair, one row per MATCHED scoring clause anywhere in the
    query tree — (query_id, doc_id, node, depth, role, kind, text,
    boost, score). `node` / `depth` locate the clause in the bool tree
    (node 0 is the root; ids assigned in role order must, should,
    must_not then document order — deterministic). Works for flat and
    nested queries alike (everything compiles through the tree path);
    filter context gates nothing here — explain shows raw clause
    contributions, the composition rules are the module docstring's.
    The doc restriction rides the docmap scan as a pushed-down doc_id
    predicate; clause execution is the standard shared plan."""
    spark = index.spark
    analyzer = index.stats["analyzer"]
    doc_ids = sorted({str(d) for d in doc_ids})
    if not doc_ids:
        raise ValueError("doc_ids must name at least one document")
    trees: dict = {}
    for qid, qdict in sorted(queries.items()):
        qid = str(qid)
        if _GLUE in qid:
            raise ValueError(
                f"query_id {qid!r} contains the reserved separator U+001E"
            )
        if not isinstance(qdict, dict) or len(qdict) != 1:
            raise ValueError(
                f"a DSL query maps exactly one query type, got {qdict!r}"
            )
        kind = next(iter(qdict))
        body = (qdict["bool"] if kind == "bool"
                else {"must": [qdict]} if kind in ("dis_max",
                                                   "constant_score",
                                                   "match_all")
                else {"should": [qdict]})
        # mirror search_dsl's top-level handling: a bare match with
        # operator='and' is legal at the top (compile_dsl maps its tokens
        # to must) — explain must accept the same query, so strip the
        # operator and wrap under must instead of should
        if kind == "match" and isinstance(qdict.get("match"), dict) \
                and len(qdict["match"]) == 1:
            fld, spec = next(iter(qdict["match"].items()))
            if isinstance(spec, dict) and spec.get("operator") == "and":
                cleaned = {k: v for k, v in spec.items() if k != "operator"}
                body = {"must": [{"match": {fld: cleaned}}]}
        root = _compile_bool_node(body, analyzer, _TreeCtx(), 0)
        if root is not None:
            trees[qid] = root
    schema = ("query_id string, doc_id string, node int, depth int,"
              " role string, kind string, text string, boost double,"
              " score double")
    clause_pq: dict = {}
    meta_rows: list = []
    for qid, root in sorted(trees.items()):
        for node in _walk_nodes(root):
            for (iid, role, c) in node.clause_items:
                clause_pq[f"{qid}{_GLUE}{iid}"] = [
                    Clause("should", c.kind, c.text, c.boost,
                           slop=c.slop, edits=c.edits, tokens=c.tokens)
                ]
                meta_rows.append(
                    (qid, iid, node.node_id, node.depth, role, c.kind,
                     c.text, float(c.boost))
                )
    if not clause_pq:
        return spark.createDataFrame([], schema)
    cand = _execute_clauses(
        index, clause_pq, 10, {}, max_expansions, fuzzy_prefix_len,
        finalize=False,
    )
    items = cand.select(
        F.substring_index("query_id", _GLUE, 1).alias("query_id"),
        F.substring_index("query_id", _GLUE, -1).cast("int").alias("iid"),
        "shard", "doc_ord", "score",
    )
    sel = F.broadcast(
        index.docmap.where(F.col("doc_id").isin(doc_ids)).select(
            "shard", "doc_ord", "doc_id"
        )
    )
    meta = F.broadcast(inline_table(spark, 
        meta_rows,
        "query_id string, iid int, node int, depth int, role string,"
        " kind string, text string, boost double",
    ))
    return (
        items.join(sel, ["shard", "doc_ord"])
        .join(meta, ["query_id", "iid"])
        .select("query_id", "doc_id", "node", "depth", "role", "kind",
                "text", "boost", "score")
        .orderBy("query_id", "doc_id", "node", "role", "text")
    )
