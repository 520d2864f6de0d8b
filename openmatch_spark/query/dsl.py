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
                    "minimum_should_match": n}}

Documented deviations (all fail loudly, never silently approximate):
  * the index is single-field — the leaf field key must be "text";
  * `bool` does not nest (no bool inside bool) and has no `filter` list —
    filter context is query/filtered.py's surface (search_filtered);
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
from pyspark.sql import DataFrame

from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.querystring import (
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


def _leaf_clauses(kind: str, body, role: str, allow_operator: bool):
    """One DSL leaf -> [Clause] (pre-analysis: texts still raw)."""
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"{kind} must map exactly one field, got {body!r}")
    field, spec = next(iter(body.items()))
    if field != "text":
        raise ValueError(
            f"unknown field {field!r} — this index has the single analyzed "
            "field 'text'"
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
        return [Clause(role, "term", text, boost)]
    if kind == "match_phrase":
        slop = int(spec.get("slop", 0))
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        return [Clause(role, "phrase", text, boost, slop=slop)]
    if kind == "fuzzy":
        edits = int(spec.get("fuzziness", 2))
        if not 0 <= edits <= 2:
            raise ValueError(f"fuzziness must be 0..2, got {edits}")
        return [Clause(role, "fuzzy", text, boost, edits=edits)]
    return [Clause(role, ckind, text, boost)]


def compile_dsl(query: dict) -> tuple[list, int]:
    """One DSL dict -> (raw clauses, minimum_should_match). Pure and
    deterministic; analysis happens later against the index analyzer."""
    if not isinstance(query, dict) or len(query) != 1:
        raise ValueError(
            f"a DSL query maps exactly one query type, got {query!r}"
        )
    kind, body = next(iter(query.items()))
    if kind in _LEAF_KINDS:
        # a bare leaf at the top level scores whatever it matches
        return _leaf_clauses(kind, body, "should", allow_operator=True), 0
    if kind != "bool":
        raise ValueError(
            f"unsupported query type {kind!r} (supported: bool, "
            f"{', '.join(_LEAF_KINDS)})"
        )
    if not isinstance(body, dict):
        raise ValueError(f"bool body must be a dict, got {body!r}")
    unknown = set(body) - {"must", "should", "must_not", "minimum_should_match"}
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
                raise ValueError("nested bool queries are not supported")
            if ekind not in _LEAF_KINDS:
                raise ValueError(f"unsupported query type {ekind!r} in bool")
            clauses.extend(
                _leaf_clauses(ekind, ebody, role, allow_operator=False)
            )
    if not clauses:
        raise ValueError("bool query has no clauses")
    return clauses, msm


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


def search_dsl(
    index: BM25Index,
    queries,
    k: int = 100,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) for ES-DSL query dicts.

    queries: {query_id: dsl_dict} — or a DataFrame(query_id, dsl) whose
    dsl column holds the JSON text (the CLI shape). Compilation is
    driver-side (queries are small); execution is the query_string
    surface's single declarative plan."""
    if isinstance(queries, DataFrame):
        rows = queries.select(
            F.col("query_id").cast("string").alias("query_id"), "dsl"
        ).collect()
        queries = {
            str(r["query_id"]): json.loads(r["dsl"]) for r in rows
        }
    analyzer = index.stats["analyzer"]
    per_q: dict = {}
    msm_by_q: dict = {}
    for qid, qdict in sorted(queries.items()):
        raw, msm = compile_dsl(qdict)
        per_q[str(qid)] = _analyzed(raw, analyzer)
        if msm:
            # resolve percentage/negative forms against the POST-analysis
            # should-clause count (a multi-token match is several clauses)
            n_should = sum(
                1 for c in per_q[str(qid)] if c.role == "should"
            )
            resolved = resolve_msm(msm, n_should)
            if resolved:
                msm_by_q[str(qid)] = resolved
        # ES term queries are atomic: a value that analyzes into several
        # tokens means the caller wanted `match`
        from openmatch_spark.analysis import tokenize_py

        for v in _collect_term_values(qdict):
            toks = tokenize_py(v, analyzer)
            if len(toks) != 1:
                raise ValueError(
                    f"term value {v!r} analyzes to {len(toks)} tokens — "
                    "use match for multi-token text"
                )
    return _execute_clauses(
        index, per_q, k, msm_by_q, max_expansions, fuzzy_prefix_len
    )


def _collect_term_values(query: dict) -> list:
    """All `term` leaf values in a DSL dict (for atomicity validation)."""
    out = []
    kind, body = next(iter(query.items()))
    entries = []
    if kind == "term":
        entries = [body]
    elif kind == "bool":
        for role in ("must", "should", "must_not"):
            rs = body.get(role, [])
            rs = [rs] if isinstance(rs, dict) else rs
            for e in rs:
                if next(iter(e.items()))[0] == "term":
                    entries.append(e["term"])
    for b in entries:
        spec = next(iter(b.values()))
        out.append(spec if isinstance(spec, str) else spec.get("value"))
    return out
