"""Lucene-classic-style query_string search — one string per query, parsed
into boolean clauses and executed against the packed index.

The reference exposes its first stage through Pyserini/Anserini query
strings (Lucene classic QueryParser); this module gives the engine the
same one-string front door by compiling the string onto the already-
verified clause machinery (boolean roles, phrase/positional match,
prefix/wildcard/fuzzy expansion).

Grammar — the documented, deterministic subset:

  segment  := [+|-] body [^BOOST]
  body     := "tok tok ..."[~SLOP]      sloppy/exact phrase clause
            | tok*                      prefix clause (trailing * only)
            | tok with * or ?           wildcard clause
            | tok~[EDITS]               fuzzy clause (default 2 edits)
            | tok                       term clause
  role     : '+' = MUST, '-' = MUST_NOT, bare = default_operator
             ("or" -> SHOULD, "and" -> MUST)
  BOOST    : positive float, multiplies every weight the clause emits
  SLOP     : ES match_phrase-style — matched iff some token window of
             width <= n_tokens + slop contains every DISTINCT phrase term
             (duplicate tokens collapse under slop > 0; slop = 0 is the
             exact consecutive-in-order phrase with duplicates honored)
  EDITS    : Levenshtein budget, Lucene FuzzyQuery's first-char prefix gate

PARENTHESES and the AND / OR / NOT (&& / || / !) keywords ARE
supported: a query containing any of them compiles to a nested-bool
DSL tree (query/dsl.py's item-composition executor) via
`parse_query_string_grouped`, with Lucene classic QueryParser's exact
addClause occur rules — AND retroactively promotes the preceding
non-prohibited clause to MUST; under default_operator 'and', OR
retroactively demotes it to SHOULD (even an explicit '+', Lucene's
own quirk); NOT / ! / - prohibit the next clause; a parenthesized
group is ONE clause of its parent and `(...)^B` distributes the boost
multiplicatively into every descendant leaf (exact, since a group's
score is the sum of its children). Keywords must be uppercase
(lowercase and/or/not are terms, as in Lucene); a bare '!' only acts
as NOT inside grouped queries — a query with no grouping syntax keeps
the byte-identical legacy flat path.

Field prefixes (`title:x`, `-lang:de`) and inline ranges
(`n:[10 TO 20]`) ARE supported on the FIELDED surface
(parse_query_string_fielded / search_query_string_fielded over a
load_fielded_index family — analyzed fields score per-field, attribute
fields compile to filter context). Remaining deviations: the
single-index surface here stays field-free (one analyzed field), and
field prefixes do not compose with grouping parens/keywords yet. A
segment whose text analyzes to several tokens becomes one clause PER
TOKEN with the segment's role and boost (the ES match-query
decomposition).

Semantics (Lucene BooleanClause composition, shared with search_boolean):
  * every MUST clause must match; an unsatisfiable MUST clause (OOV term,
    zero expansions, phrase with an OOV token) kills the whole query;
  * SHOULD clauses contribute score; min_should_match requires that many
    DISTINCT should clauses matched per hit;
  * MUST_NOT excludes, never scores; a query whose only clauses are
    MUST_NOT returns nothing (nothing can rank it);
  * score = Σ over matched scoring clauses of boost x BM25 contribution:
    term clauses weight 1, fuzzy variants 1/(1+edits), prefix/wildcard
    variants 1, phrase clauses the BM25 sum of their constituent terms
    with in-phrase qtf (search_phrase's documented scoring);
  * expansion caps and orderings are exactly query/expand.py's
    (edits ASC, df DESC, term ASC — deterministic, oracle-replicable).

Plan shape: parsing is driver-side for interactive batches (zero Spark
jobs), executor-side above the engine-wide distributed threshold
(_parsed_queries: pure per-row parse + analyze in mapInPandas, only
compact compiled clause rows return); execution is one declarative plan: postings pruned to the referenced
term buckets, one decode + one broadcast clause join + one (query, doc)
aggregate for the term side; the positional sidecar only for phrase
clauses; must_not postings anti-joined AFTER candidate aggregation so an
exclusion term costs one bounded shuffle of its own postings.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.index.compact import _decode_blocks_arrow
from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.expand import _expansions, wildcard_to_like
from openmatch_spark.functions.localrel import in_list, inline_table, literal_map
from openmatch_spark.query.phrase import (
    _DECODED_POSTINGS,
    _bm25_scores,
    _finalize,
    _min_cover_grouped,
    _pruned_positions,
)

_RUN_SCHEMA = "query_id string, doc_id string, score double, rank int"
_SEP = "\x1f"  # composite-key glue for per-clause phrase machinery


@dataclass(frozen=True)
class Clause:
    role: str  # 'must' | 'should' | 'must_not'
    kind: str  # 'term' | 'phrase' | 'prefix' | 'wildcard' | 'fuzzy'
    text: str  # analyzed token, pattern (sans operators), or phrase body
    boost: float = 1.0
    slop: int = 0  # phrase only
    edits: int = 2  # fuzzy only
    tokens: tuple = field(default_factory=tuple)  # phrase only (analyzed)
    # group >= 0 makes several clauses count as ONE boolean unit: a MUST
    # group matches when ANY member matches (Lucene's nested match query —
    # a multi-token segment under default_operator 'or'), and an OOV
    # member never kills the query alone. A caller must either group ALL
    # of a query's clauses (with ids unique per unit) or none — group ids
    # share the cid space with list positions.
    group: int = -1
    # which index field the clause targets; the single-field executor
    # ignores it, the fielded DSL routes each clause to its sub-index
    fieldname: str = "text"


_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')
_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")
# segments: an optionally +/- prefixed quoted phrase with optional ~N / ^B
# suffixes, or a bare token
_SEGMENT_RE = re.compile(r'[-+]?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?|\S+')


def parse_query_string(s: str, default_operator: str = "or") -> list[Clause]:
    """Parse one query string into raw clauses (module grammar). Pure and
    deterministic; analysis/tokenization happens later against the index's
    analyzer, so the same parse serves any index."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    bare_role = "should" if default_operator == "or" else "must"
    out: list[Clause] = []
    for seg in _SEGMENT_RE.findall(s or ""):
        role = bare_role
        if seg.startswith("+"):
            role, seg = "must", seg[1:]
        elif seg.startswith("-"):
            role, seg = "must_not", seg[1:]
        if not seg:
            continue
        boost = 1.0
        m = _BOOST_RE.search(seg)
        if m:
            boost = float(m.group(1))
            seg = seg[: m.start()]
            if boost <= 0:
                raise ValueError(f"boost must be positive, got {boost}")
        m = _PHRASE_RE.match(seg)
        if m:
            body, slop = m.group(1), int(m.group(2) or 0)
            if body.strip():
                out.append(Clause(role, "phrase", body, boost, slop=slop))
            continue
        seg = seg.strip('"')  # tolerate an unbalanced stray quote
        if not seg:
            continue
        m = _FUZZY_RE.match(seg)
        if m and "*" not in seg and "?" not in seg:
            out.append(
                Clause(role, "fuzzy", m.group(1), boost,
                       edits=int(m.group(2) or 2))
            )
            continue
        if "*" in seg or "?" in seg:
            if seg.endswith("*") and not re.search(r"[*?]", seg[:-1]):
                if seg[:-1]:
                    out.append(Clause(role, "prefix", seg[:-1], boost))
            else:
                out.append(Clause(role, "wildcard", seg, boost))
            continue
        out.append(Clause(role, "term", seg, boost))
    return out


# grouping syntax that routes a query to the nested-bool tree executor
_GROUPED_RE = re.compile(r"[()]|&&|\|\||\b(?:AND|OR|NOT)\b")
# one grouped-grammar token: quoted phrase (with suffixes), paren,
# keyword operator, standalone modifier, boost suffix, or bare segment
_GTOKEN_RE = re.compile(
    r'"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
    r"|\(|\)|&&|\|\||\^\d+(?:\.\d+)?|[^\s()]+"
)


def _clause_to_dsl(c: Clause) -> dict:
    """One parsed legacy Clause -> the equivalent DSL leaf dict (same
    decomposition and scoring once compiled back)."""
    if c.kind == "phrase":
        return {"match_phrase": {"text": {"query": c.text, "slop": c.slop,
                                          "boost": c.boost}}}
    if c.kind == "prefix":
        return {"prefix": {"text": {"value": c.text, "boost": c.boost}}}
    if c.kind == "wildcard":
        return {"wildcard": {"text": {"value": c.text, "boost": c.boost}}}
    if c.kind == "fuzzy":
        return {"fuzzy": {"text": {"value": c.text, "fuzziness": c.edits,
                                   "boost": c.boost}}}
    # term segments (possibly multi-token) are the match decomposition
    return {"match": {"text": {"query": c.text, "boost": c.boost}}}


def _apply_group_boost(q: dict, boost: float) -> dict:
    """Distribute a group boost multiplicatively into every descendant
    leaf (exact: a group's score is the sum of its children)."""
    if boost == 1.0:
        return q
    kind, body = next(iter(q.items()))
    if kind == "bool":
        out = {}
        for role, entries in body.items():
            out[role] = [_apply_group_boost(e, boost) for e in entries]
        return {"bool": out}
    spec = dict(next(iter(body.values())))
    spec["boost"] = spec.get("boost", 1.0) * boost
    return {kind: {"text": spec}}


def _add_grouped_clause(clauses: list, q: dict, conj, mods, dop: str) -> None:
    """Lucene classic QueryParserBase.addClause occur resolution."""
    if clauses and conj == "AND":
        if clauses[-1][0] != "must_not":
            clauses[-1][0] = "must"
    if clauses and dop == "and" and conj == "OR":
        if clauses[-1][0] != "must_not":
            clauses[-1][0] = "should"
    if dop == "or":
        if mods == "NOT":
            occur = "must_not"
        elif mods == "REQ" or conj == "AND":
            occur = "must"
        else:
            occur = "should"
    else:
        if mods == "NOT":
            occur = "must_not"
        elif mods == "REQ":
            occur = "must"
        else:
            occur = "should" if conj == "OR" else "must"
    clauses.append([occur, q])


def _parse_group(toks: list, i: int, dop: str, top: bool) -> tuple[dict, int]:
    """Recursive descent over grouped-grammar tokens from position i.
    Returns (DSL bool dict, next position)."""
    clauses: list = []
    conj = None
    mods = None
    closed = False
    while i < len(toks):
        t = toks[i]
        if t == ")":
            if top:
                raise ValueError("unbalanced ')' in query string")
            i += 1
            closed = True
            break
        if t in ("AND", "&&"):
            conj, i = "AND", i + 1
            continue
        if t in ("OR", "||"):
            conj, i = "OR", i + 1
            continue
        if t in ("NOT", "!"):
            mods, i = "NOT", i + 1
            continue
        if t == "+":
            mods, i = "REQ", i + 1
            continue
        if t == "-":
            mods, i = "NOT", i + 1
            continue
        if t == "(":
            sub, i = _parse_group(toks, i + 1, dop, top=False)
            boost = 1.0
            if i < len(toks) and re.fullmatch(r"\^\d+(?:\.\d+)?", toks[i]):
                boost = float(toks[i][1:])
                if boost <= 0:
                    raise ValueError(f"boost must be positive, got {boost}")
                i += 1
            _add_grouped_clause(
                clauses, _apply_group_boost(sub, boost), conj, mods, dop
            )
            conj = mods = None
            continue
        if re.fullmatch(r"\^\d+(?:\.\d+)?", t):
            raise ValueError(f"dangling boost {t!r} in query string")
        # one plain segment: the legacy single-segment parse handles
        # embedded +/- prefixes, phrases, suffixes; '!seg' is the NOT
        # modifier glued to its segment
        seg = t
        if seg.startswith("!") and len(seg) > 1:
            mods, seg = "NOT", seg[1:]
        parsed = parse_query_string(seg, "or")
        i += 1
        if not parsed:
            continue
        c = parsed[0]
        emb = {"must": "REQ", "must_not": "NOT"}.get(c.role)
        _add_grouped_clause(
            clauses, _clause_to_dsl(c), conj, emb or mods, dop
        )
        conj = mods = None
    if not top and not closed:
        raise ValueError("unbalanced '(' in query string")
    body: dict = {}
    for occur, q in clauses:
        body.setdefault(occur, []).append(q)
    if not body:
        raise ValueError("empty group in query string")
    return {"bool": body}, i


def parse_query_string_grouped(s: str, default_operator: str = "or") -> dict:
    """One grouped query string (parentheses / AND / OR / NOT) -> the
    equivalent DSL dict (module docstring: Lucene classic occur rules;
    group boosts distributed into leaves)."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    toks = _GTOKEN_RE.findall(s or "")
    node, i = _parse_group(toks, 0, default_operator, top=True)
    if i != len(toks):
        raise ValueError("unbalanced parentheses in query string")
    return node


# fielded grammar segment: optional +/- occur prefix, optional field:
# prefix, then a quoted phrase (with ~slop / ^boost suffixes), a
# [a TO b] / {a TO b} range bracket (spaces allowed inside), or a bare
# token (boost/fuzzy suffixes dissected afterwards)
_FSEG_RE = re.compile(
    r'[-+]?(?:[A-Za-z_][\w.]*:)?'
    r'(?:"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
    r'|[\[{][^\[\]{}]*\bTO\b[^\[\]{}]*[\]}]'
    r'|\S+)'
)
_FIELD_RE = re.compile(r"^([A-Za-z_][\w.]*):")
_RANGE_RE = re.compile(
    r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$"
)


def parse_query_string_fielded(
    s: str,
    analyzed_fields,
    attr_fields=(),
    default_operator: str = "or",
) -> dict:
    """One field-prefixed query string -> the equivalent fielded DSL dict
    (search_dsl_fielded input) — Lucene classic QueryParser field syntax:

      title:spark            match on that field's sub-index
      title:"spark engine"~1 fielded phrase (slop)
      title:spar*            fielded prefix/wildcard, title:sprk~1 fuzzy
      lang:en                ATTRIBUTE field (store_attrs doc values) —
                             compiles to filter context: gates, never
                             scores (attrs are not analyzed/indexed, so
                             Lucene's scoring TermQuery has no statistics
                             to score with here; documented deviation)
      -lang:de               negated attribute filter (exclusion)
      n_chars:[100 TO 500]   range filter — [..] inclusive, {..}
                             exclusive, '*' for an open end; ranges are
                             attribute-only (an analyzed field has no
                             ordered doc value to range over)
      spark                  a bare segment spreads over ALL analyzed
                             fields as a dis_max (ES query_string's
                             fields="*" / best_fields default)
      +x / -x                occur prefixes, ^B boosts — as the flat
                             grammar

    A `foo:` prefix is treated as a field ONLY when foo names an analyzed
    or attribute field — otherwise the token (e.g. a URL "https://x")
    stays literal text. Grouping syntax (parens/AND/OR/NOT) does not
    compose with field prefixes yet; strings mixing both are refused."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    analyzed = tuple(sorted(analyzed_fields))
    attrs = tuple(sorted(attr_fields))
    if not analyzed:
        raise ValueError("analyzed_fields must name at least one field")
    known = set(analyzed) | set(attrs)
    if _GROUPED_RE.search(s or ""):
        raise ValueError(
            "field-prefixed query strings do not compose with grouping "
            "syntax (parentheses / AND / OR / NOT) — write the query as a "
            "fielded DSL dict (search_dsl_fielded) instead"
        )
    bare_role = "should" if default_operator == "or" else "must"
    body: dict = {}

    def _add(role, leaf):
        body.setdefault(role, []).append(leaf)

    def _bound(v: str):
        # numeric-looking bounds compare numerically (int column vs
        # string literal would lean on implicit casts); others lexically
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    def _range_spec(m) -> dict:
        lo_op = "gte" if m.group(1) == "[" else "gt"
        hi_op = "lte" if m.group(4) == "]" else "lt"
        spec = {}
        if m.group(2) != "*":
            spec[lo_op] = _bound(m.group(2))
        if m.group(3) != "*":
            spec[hi_op] = _bound(m.group(3))
        if not spec:
            raise ValueError("range needs at least one bound, got [* TO *]")
        return spec

    for seg in _FSEG_RE.findall(s or ""):
        role = bare_role
        if seg.startswith("+"):
            role, seg = "must", seg[1:]
        elif seg.startswith("-"):
            role, seg = "must_not", seg[1:]
        fld = None
        fm = _FIELD_RE.match(seg)
        if fm and fm.group(1) in known:
            fld, seg = fm.group(1), seg[fm.end():]
        if not seg:
            continue
        boost = 1.0
        bm = _BOOST_RE.search(seg)
        if bm and not seg.endswith('"'):
            boost = float(bm.group(1))
            seg = seg[: bm.start()]
            if boost <= 0:
                raise ValueError(f"boost must be positive, got {boost}")
        rm = _RANGE_RE.match(seg)
        if fld in attrs:
            pm = _PHRASE_RE.match(seg)
            if pm:  # quoted attribute value: exact term filter
                spec = {"term": {fld: pm.group(1)}}
            elif rm:
                spec = {"range": {fld: _range_spec(rm)}}
            else:
                spec = {"term": {fld: seg}}
            if role == "must_not":
                # filter-only bool under must_not -> anti_filters
                # (dsl._compile_bool_node's documented exclusion shape)
                _add("must_not", {"bool": {"filter": [spec]}})
            else:
                # gates never score; '+' vs bare is the same gate
                _add("filter", spec)
            continue
        if rm:
            raise ValueError(
                f"range {seg!r} needs an attribute field prefix — analyzed "
                "fields have no ordered doc value to range over"
            )
        targets = (fld,) if fld else analyzed
        pm = _PHRASE_RE.match(seg)
        if pm:
            btext, slop = pm.group(1), int(pm.group(2) or 0)
            if not btext.strip():
                continue
            leaves = [
                {"match_phrase": {f: {"query": btext, "slop": slop,
                                      "boost": boost}}}
                for f in targets
            ]
        else:
            seg = seg.strip('"')
            if not seg:
                continue
            fzm = _FUZZY_RE.match(seg)
            if fzm and "*" not in seg and "?" not in seg:
                # Lucene FuzzyQuery clamps maxEdits at 2 (query text is
                # lenient here, same contract as simple_query_string)
                edits = min(int(fzm.group(2) or 2), 2)
                leaves = [
                    {"fuzzy": {f: {"value": fzm.group(1),
                                   "fuzziness": edits, "boost": boost}}}
                    for f in targets
                ]
            elif "*" in seg or "?" in seg:
                if seg.endswith("*") and not re.search(r"[*?]", seg[:-1]):
                    if not seg[:-1]:
                        continue
                    leaves = [
                        {"prefix": {f: {"value": seg[:-1], "boost": boost}}}
                        for f in targets
                    ]
                else:
                    leaves = [
                        {"wildcard": {f: {"value": seg, "boost": boost}}}
                        for f in targets
                    ]
            else:
                leaves = [
                    {"match": {f: {"query": seg, "boost": boost}}}
                    for f in targets
                ]
        if len(leaves) == 1:
            _add(role, leaves[0])
        elif role == "must_not":
            # NOT(a OR b) == NOT a AND NOT b: exclusion needs no dis_max
            for leaf in leaves:
                _add(role, leaf)
        else:
            # bare segment: ES best_fields over every analyzed field
            _add(role, {"dis_max": {"queries": leaves}})
    if not body:
        raise ValueError("empty query string")
    return {"bool": body}


def search_query_string_fielded(
    findex: dict,
    queries: DataFrame,
    k: int = 100,
    default_operator: str = "or",
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
    distributed_threshold: int | None = None,
) -> DataFrame:
    """Top-k run for field-prefixed query strings over a fielded index
    ({field: BM25Index} from load_fielded_index) — the query_string front
    door the fielded DSL was missing (parse_query_string_fielded's
    grammar). Attribute fields come from the family's common store_attrs;
    execution is search_dsl_fielded's tree plan.

    Batches above the engine-wide distributed threshold PARSE
    executor-side (the parser is pure and stateless) and only compact
    (query_id, dsl-json) rows return; a ValueError raised on any query
    text comes back as an error row and re-raises driver-side —
    identical results and error contract to the driver path."""
    from openmatch_spark.query.bm25_search import (
        _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    )
    from openmatch_spark.query.fielded import search_dsl_fielded
    from openmatch_spark.session import scoped_confs

    if not findex:
        raise ValueError("findex is empty")
    if distributed_threshold is None:
        distributed_threshold = _DISTRIBUTED_TOKENIZE_MIN_QUERIES
    analyzed = tuple(sorted(findex))
    stored = tuple(sorted(
        set.intersection(*(set(findex[f].stored_attrs) for f in analyzed))
    )) if all(findex[f].stored_attrs for f in analyzed) else tuple()
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
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
        rows = q.take(distributed_threshold + 1)
    if len(rows) <= distributed_threshold:
        dsls = {
            str(r["query_id"]): parse_query_string_fielded(
                r["text"] or "", analyzed, stored, default_operator
            )
            for r in rows
        }
    else:
        import json as _json

        def _parse_part(it):
            import pandas as pd

            from openmatch_spark.query.querystring import (
                parse_query_string_fielded as pf,
            )

            for pdf in it:
                qids, kinds, payloads = [], [], []
                for qid, text in zip(pdf["query_id"], pdf["text"]):
                    try:
                        kind, payload = "ok", _json.dumps(
                            pf(text or "", analyzed, stored, default_operator)
                        )
                    except ValueError as e:
                        kind, payload = "error", str(e)
                    qids.append(str(qid))
                    kinds.append(kind)
                    payloads.append(payload)
                yield pd.DataFrame(
                    {"query_id": qids, "kind": kinds, "payload": payloads}
                )

        compiled = q.mapInPandas(
            _parse_part, "query_id string, kind string, payload string"
        ).collect()
        dsls = {}
        for r in compiled:
            if r["kind"] == "error":
                raise ValueError(r["payload"])
            dsls[r["query_id"]] = _json.loads(r["payload"])
    return search_dsl_fielded(
        findex, dsls, k=k, max_expansions=max_expansions,
        fuzzy_prefix_len=fuzzy_prefix_len,
    )


def _tokens_cached(text: str, analyzer: str, cache: dict | None) -> list:
    """tokenize_py with an optional {(analyzer, text) -> tokens} memo —
    filled executor-side for huge batches (query/dsl.py
    _distributed_tok_cache). A miss falls back to the driver tokenizer,
    so the cache is purely an optimization: correctness never depends on
    the walker that filled it having found every text."""
    if cache is not None:
        hit = cache.get((analyzer, text))
        if hit is not None:
            return list(hit)
    from openmatch_spark.analysis import tokenize_py

    return tokenize_py(text, analyzer)


def _analyzed(
    clauses: list[Clause], analyzer: str, tok_cache: dict | None = None
) -> list[Clause]:
    """Normalize parsed clauses against the index analyzer: term texts
    re-tokenize (multi-token segments split into one clause per token),
    phrase bodies tokenize in order, pattern bodies keep only the
    analyzer-legal chars plus wildcards. Empty results drop.
    tok_cache: optional executor-side-filled token memo (_tokens_cached)."""

    def tokenize_py(text, a):
        return _tokens_cached(text, a, tok_cache)

    out: list[Clause] = []
    for c in clauses:
        if c.kind == "phrase":
            toks = tuple(tokenize_py(c.text, analyzer))
            if toks:
                out.append(Clause(c.role, "phrase", c.text, c.boost,
                                  slop=c.slop, tokens=toks, group=c.group,
                                  fieldname=c.fieldname))
        elif c.kind in ("prefix", "fuzzy"):
            for tok in tokenize_py(c.text, analyzer):
                out.append(Clause(c.role, c.kind, tok, c.boost,
                                  edits=c.edits, group=c.group,
                                  fieldname=c.fieldname))
        elif c.kind == "wildcard":
            pat = re.sub(r"[^a-z0-9*?]+", "", c.text.lower())
            if pat.replace("*", "").replace("?", ""):
                out.append(Clause(c.role, "wildcard", pat, c.boost,
                                  group=c.group, fieldname=c.fieldname))
        elif c.kind == "regexp":
            # Lucene RegexpQuery clause (DSL-only; the query_string grammar
            # never emits it): restrict to the Java/RE2 common charset and
            # validate — same contract as expand.py search_regexp
            from openmatch_spark.query.expand import _REGEXP_ALLOWED

            pat = re.sub(_REGEXP_ALLOWED, "", c.text.lower())
            if pat:
                try:
                    re.compile(f"^(?:{pat})$")
                except re.error as e:
                    raise ValueError(
                        f"invalid regexp pattern {pat!r}: {e}"
                    ) from e
                out.append(Clause(c.role, "regexp", pat, c.boost,
                                  group=c.group, fieldname=c.fieldname))
        else:
            for tok in tokenize_py(c.text, analyzer):
                out.append(Clause(c.role, "term", tok, c.boost,
                                  group=c.group, fieldname=c.fieldname))
    return out


def _clause_to_row(c: Clause) -> list:
    return [c.role, c.kind, c.text, c.boost, c.slop, c.edits, c.group,
            c.fieldname, list(c.tokens)]


def _clause_from_row(r: list) -> Clause:
    return Clause(r[0], r[1], r[2], boost=float(r[3]), slop=int(r[4]),
                  edits=int(r[5]), group=int(r[6]), fieldname=r[7],
                  tokens=tuple(r[8]))


def _parsed_queries(
    queries: DataFrame,
    default_operator: str,
    analyzer: str,
    distributed_threshold: int | None = None,
) -> tuple[dict, dict]:
    """(grouped, per_q): grouped = {qid: DSL dict} for queries using
    parentheses/keywords, per_q = {qid: [Clause]} analyzed flat clauses.

    Small batches (the interactive regime) parse driver-side with zero
    Spark jobs. Batches above the engine-wide threshold
    (bm25_search._DISTRIBUTED_TOKENIZE_MIN_QUERIES) parse AND analyze
    executor-side — the parse + tokenize is pure per-row Python, the
    expensive part at 100k queries — and only compact compiled clause
    rows return to the driver (which must hold them anyway: they become
    the broadcast clause tables). A ValueError raised on any query text
    (e.g. unbalanced parentheses) is carried back as an error row and
    re-raised driver-side, preserving the driver-path error contract."""
    from openmatch_spark.query.bm25_search import (
        _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    )
    from openmatch_spark.session import scoped_confs

    if distributed_threshold is None:
        distributed_threshold = _DISTRIBUTED_TOKENIZE_MIN_QUERIES
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
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
    grouped: dict = {}
    per_q: dict = {}
    if len(head) <= distributed_threshold:
        for r in head:
            qid, text = str(r["query_id"]), r["text"]
            if _GROUPED_RE.search(text or ""):
                grouped[qid] = parse_query_string_grouped(
                    text, default_operator
                )
            else:
                per_q[qid] = _analyzed(
                    parse_query_string(text or "", default_operator), analyzer
                )
        return grouped, per_q

    import json as _json

    def _compile_part(it):
        import pandas as pd

        from openmatch_spark.query.querystring import (
            _GROUPED_RE as G,
            _analyzed as an,
            _clause_to_row as tr,
            parse_query_string as pq,
            parse_query_string_grouped as pg,
        )

        for pdf in it:
            qids, kinds, payloads = [], [], []
            for qid, text in zip(pdf["query_id"], pdf["text"]):
                try:
                    if G.search(text or ""):
                        kind, payload = "grouped", _json.dumps(
                            pg(text, default_operator)
                        )
                    else:
                        kind, payload = "flat", _json.dumps(
                            [tr(c) for c in
                             an(pq(text or "", default_operator), analyzer)]
                        )
                except ValueError as e:
                    kind, payload = "error", str(e)
                qids.append(str(qid))
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"query_id": qids, "kind": kinds, "payload": payloads}
            )

    compiled = q.mapInPandas(
        _compile_part, "query_id string, kind string, payload string"
    ).collect()
    for r in compiled:
        if r["kind"] == "error":
            raise ValueError(r["payload"])
        if r["kind"] == "grouped":
            grouped[r["query_id"]] = _json.loads(r["payload"])
        else:
            per_q[r["query_id"]] = [
                _clause_from_row(x) for x in _json.loads(r["payload"])
            ]
    return grouped, per_q


def search_query_string(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    default_operator: str = "or",
    min_should_match: int = 0,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
    distributed_threshold: int | None = None,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) for query strings.

    queries: (query_id, text) with text in the module grammar. Clause
    semantics, caps, and weights per the module docstring; phrase clauses
    need the positional sidecar (index/positions.py). Batches above the
    engine-wide distributed threshold parse + analyze executor-side
    (_parsed_queries)."""
    analyzer = index.stats["analyzer"]
    grouped, per_q = _parsed_queries(
        queries, default_operator, analyzer, distributed_threshold
    )
    flat = _execute_clauses(
        index, per_q, k, min_should_match, max_expansions, fuzzy_prefix_len
    )
    if not grouped:
        return flat
    if min_should_match:
        raise ValueError(
            "min_should_match does not compose with grouped query strings "
            "— write the quota into the groups (the DSL surface takes "
            "per-bool minimum_should_match)"
        )
    from openmatch_spark.query.dsl import search_dsl

    grun = search_dsl(index, grouped, k, max_expansions, fuzzy_prefix_len)
    if not per_q:
        return grun
    return flat.unionByName(grun)


_CAND_SCHEMA = "query_id string, shard int, doc_ord long, score double"


def _execute_clauses(
    index: BM25Index,
    per_q: dict,
    k: int,
    min_should_match,
    max_expansions: int,
    fuzzy_prefix_len: int,
    finalize: bool = True,
) -> DataFrame:
    """Execute analyzed clause lists ({query_id: [Clause]}) — the shared
    back half of search_query_string, query/dsl.py search_dsl, and
    query/simpleqs.py search_simple_query_string.
    min_should_match: a global int, or a {query_id: int} dict (the DSL's
    per-bool minimum_should_match). finalize=False returns the raw
    candidate set (query_id, shard, doc_ord, score) BEFORE the top-k cut
    and doc_id hydration — the simple_query_string branch decomposition
    needs full per-branch candidates so the branch sum can promote a doc
    that no single branch ranks in its own top k."""
    spark = index.spark
    empty = spark.createDataFrame([], _RUN_SCHEMA if finalize else _CAND_SCHEMA)
    per_q = {q: cs for q, cs in per_q.items() if cs}
    if not per_q:
        return empty

    # ---- expansion tables (shared caps/order with query/expand.py) ----
    prefix_toks = sorted(
        {c.text for cs in per_q.values() for c in cs if c.kind == "prefix"}
    )
    wild_pats = sorted(
        {c.text for cs in per_q.values() for c in cs if c.kind == "wildcard"}
    )
    reg_pats = sorted(
        {c.text for cs in per_q.values() for c in cs if c.kind == "regexp"}
    )
    fuzzy_by_edits: dict[int, set] = {}
    for cs in per_q.values():
        for c in cs:
            if c.kind == "fuzzy":
                fuzzy_by_edits.setdefault(c.edits, set()).add(c.text)
    pre_exp = (
        _expansions(index, prefix_toks, "prefix", 0, 0, max_expansions)
        if prefix_toks else {}
    )
    wild_exp = (
        _expansions(
            index, sorted(wildcard_to_like(p) for p in wild_pats),
            "wildcard", 0, 0, max_expansions,
        )
        if wild_pats else {}
    )
    reg_exp = (
        _expansions(index, reg_pats, "regexp", 0, 0, max_expansions)
        if reg_pats else {}
    )
    fuz_exp: dict[tuple, list] = {}
    for edits, toks in sorted(fuzzy_by_edits.items()):
        got = _expansions(
            index, sorted(toks), "fuzzy", edits, fuzzy_prefix_len, max_expansions
        )
        for tok, variants in got.items():
            fuz_exp[(tok, edits)] = variants

    exact_terms = sorted(
        {c.text for cs in per_q.values() for c in cs if c.kind == "term"}
        | {t for cs in per_q.values() for c in cs if c.kind == "phrase"
           for t in c.tokens}
    )
    bucket_of = index.term_buckets(exact_terms)
    for variants in (
        list(pre_exp.values()) + list(wild_exp.values())
        + list(reg_exp.values()) + list(fuz_exp.values())
    ):
        for term, _, bucket in variants:
            bucket_of[term] = bucket

    # ---- compile clause tables ----
    def _variants(c: Clause):
        if c.kind == "term":
            return [(c.text, 0)] if c.text in bucket_of else []
        if c.kind == "prefix":
            return [(t, 0) for (t, _, _) in pre_exp.get(c.text, [])]
        if c.kind == "wildcard":
            return [
                (t, 0) for (t, _, _) in wild_exp.get(wildcard_to_like(c.text), [])
            ]
        if c.kind == "regexp":
            return [(t, 0) for (t, _, _) in reg_exp.get(c.text, [])]
        return [(t, ed) for (t, ed, _) in fuz_exp.get((c.text, c.edits), [])]

    sc_rows: list = []  # (qid, cid, is_must, term, wgt) — scoring clauses
    not_terms: list = []  # (qid, term)
    ph_rows: list = []  # (ck, qid, cid, role, boost, slop, tokens)
    n_must: dict[str, int] = {}
    dead: set = set()
    for qid, cs in sorted(per_q.items()):
        # grouped clauses (Clause.group >= 0) count as ONE must unit; the
        # ungrouped path is the historical one-unit-per-clause behavior
        n_must[qid] = len({
            (c.group if c.group >= 0 else i)
            for i, c in enumerate(cs) if c.role == "must"
        })
        for cid, c in enumerate(cs):
            if c.group >= 0:
                cid = c.group
            if c.kind == "phrase":
                live = all(t in bucket_of for t in c.tokens)
                if not live:
                    # grouped: a sibling may still carry the unit — the
                    # must_m == n_must equality handles a fully-dead group
                    if c.role == "must" and c.group < 0:
                        dead.add(qid)
                    continue
                if c.role in ("must", "should"):
                    ph_rows.append(
                        (f"{qid}{_SEP}{cid}", qid, cid, c.role, c.boost,
                         c.slop, c.tokens)
                    )
                else:
                    ph_rows.append(
                        (f"{qid}{_SEP}{cid}", qid, cid, "must_not", c.boost,
                         c.slop, c.tokens)
                    )
                continue
            vs = _variants(c)
            if not vs:
                if c.role == "must" and c.group < 0:
                    dead.add(qid)
                continue
            if c.role == "must_not":
                not_terms.extend((qid, t) for (t, _) in vs)
            else:
                sc_rows.extend(
                    (qid, cid, int(c.role == "must"), t, c.boost / (1.0 + ed))
                    for (t, ed) in vs
                )

    sc_rows = [r for r in sc_rows if r[0] not in dead]
    ph_rows = [r for r in ph_rows if r[1] not in dead]
    not_terms = sorted({(q, t) for (q, t) in not_terms if q not in dead})
    if not sc_rows and not any(r[3] != "must_not" for r in ph_rows):
        return empty

    # ---- term-clause candidates: one decode + one (query, doc) agg ----
    if sc_rows:
        terms = sorted({t for (_, _, _, t, _) in sc_rows})
        buckets = sorted({bucket_of[t] for t in terms})
        decoded = index.postings.where(
            in_list("term_bucket", buckets) & in_list("term", terms)
        ).mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
        scdf = F.broadcast(
            inline_table(spark, 
                sorted(sc_rows),
                "query_id string, cid int, is_must int, term string, wgt double",
            )
        )
        base = (
            decoded.join(scdf, "term")
            .groupBy("query_id", "shard", "doc_ord")
            .agg(
                F.sum(F.col("weight") * F.col("wgt")).alias("t_score"),
                F.count_distinct(
                    F.when(F.col("is_must") == 1, F.col("cid"))
                ).alias("t_must"),
                F.count_distinct(
                    F.when(F.col("is_must") == 0, F.col("cid"))
                ).alias("t_should"),
            )
        )
    else:
        base = spark.createDataFrame(
            [],
            "query_id string, shard int, doc_ord long, t_score double,"
            " t_must long, t_should long",
        )

    # ---- phrase clauses: match sets + constituent scoring per clause ----
    pm_agg = None
    not_phrase = None
    if ph_rows:
        matches = _phrase_matches(index, ph_rows, bucket_of)  # ck keyed
        meta_m = literal_map(
            {ck: (qid, cid, role, boost)
             for (ck, qid, cid, role, boost, _, _) in ph_rows},
            "string", "qid string, cid int, role string, boost double",
        )
        scored = matches.withColumn(
            "_mt", F.element_at(meta_m, F.col("ck"))
        ).where(F.col("_mt").isNotNull()).select(
            "ck", "shard", "doc_ord", "pscore",
            F.col("_mt.qid").alias("qid"), F.col("_mt.cid").alias("cid"),
            F.col("_mt.role").alias("role"), F.col("_mt.boost").alias("boost"),
        )
        not_phrase = (
            scored.where(F.col("role") == "must_not")
            .select(F.col("qid").alias("query_id"), "shard", "doc_ord")
            .distinct()
        )
        pm_agg = (
            scored.where(F.col("role") != "must_not")
            .groupBy(F.col("qid").alias("query_id"), "shard", "doc_ord")
            .agg(
                F.sum(F.col("pscore") * F.col("boost")).alias("p_score"),
                F.count_distinct(
                    F.when(F.col("role") == "must", F.col("cid"))
                ).alias("p_must"),
                F.count_distinct(
                    F.when(F.col("role") == "should", F.col("cid"))
                ).alias("p_should"),
            )
        )

    if pm_agg is not None:
        cand = base.join(
            pm_agg, ["query_id", "shard", "doc_ord"], "full_outer"
        ).select(
            "query_id", "shard", "doc_ord",
            (F.coalesce("t_score", F.lit(0.0))
             + F.coalesce("p_score", F.lit(0.0))).alias("score"),
            (F.coalesce("t_must", F.lit(0))
             + F.coalesce("p_must", F.lit(0))).alias("must_m"),
            (F.coalesce("t_should", F.lit(0))
             + F.coalesce("p_should", F.lit(0))).alias("should_m"),
        )
    else:
        cand = base.select(
            "query_id", "shard", "doc_ord",
            F.col("t_score").alias("score"),
            F.col("t_must").alias("must_m"),
            F.col("t_should").alias("should_m"),
        )

    # MUST composition: every must clause matched (an unsatisfiable must
    # never matches, so dead queries also fall out of the equality here —
    # the explicit `dead` prune above is just the cheaper early exit).
    # One-to-one per-query lookups (required-count, msm quota) are literal
    # maps, not broadcast joins: element_at + isNotNull is the same inner
    # equi-join on a unique key, without a broadcast-stage job per table.
    req_m = literal_map(
        {q: n for q, n in sorted(n_must.items()) if q not in dead},
        "string", "n_must int",
    )
    cand = cand.withColumn(
        "_nm", F.element_at(req_m, F.col("query_id"))
    ).where(
        F.col("_nm").isNotNull() & (F.col("must_m") == F.col("_nm"))
    ).drop("_nm")
    if isinstance(min_should_match, dict):
        msm_rows = {
            q: int(m) for q, m in sorted(min_should_match.items())
            if q in per_q and int(m) > 0
        }
        if msm_rows:
            msm_m = literal_map(msm_rows, "string", "msm int")
            cand = cand.withColumn(
                "_msm", F.element_at(msm_m, F.col("query_id"))
            ).where(
                F.col("_msm").isNull() | (F.col("should_m") >= F.col("_msm"))
            ).drop("_msm")
    elif min_should_match > 0:
        cand = cand.where(F.col("should_m") >= min_should_match)

    # MUST_NOT: anti-join each exclusion's own postings — never the scorer
    if not_terms:
        nterms = sorted({t for (_, t) in not_terms})
        nbuckets = sorted({bucket_of[t] for t in nterms})
        ndec = index.postings.where(
            in_list("term_bucket", nbuckets) & in_list("term", nterms)
        ).mapInArrow(_decode_blocks_arrow, _DECODED_POSTINGS)
        ntdf = F.broadcast(
            inline_table(spark, not_terms, "query_id string, term string")
        )
        hits_not = ndec.join(ntdf, "term").select(
            "query_id", "shard", "doc_ord"
        ).distinct()
        cand = cand.join(hits_not, ["query_id", "shard", "doc_ord"], "left_anti")
    if not_phrase is not None:
        cand = cand.join(not_phrase, ["query_id", "shard", "doc_ord"], "left_anti")

    cand = cand.select("query_id", "shard", "doc_ord", "score")
    if not finalize:
        return cand
    return _finalize(index, cand, k, [])


def _phrase_matches(index: BM25Index, ph_rows: list, bucket_of: dict):
    """(ck, shard, doc_ord, pscore) for every phrase clause match. Exact
    clauses (slop=0) use the offset-adjacency trick (all offsets agree on
    one start); sloppy clauses use the min-cover sweep over DISTINCT terms
    with window <= n_tokens + slop. pscore is the clause's constituent-term
    BM25 sum with in-phrase qtf (boost applied by the caller)."""
    spark = index.spark
    all_terms = sorted({t for (_, _, _, _, _, _, toks) in ph_rows for t in toks})
    occ = _pruned_positions(index, all_terms, bucket_of)

    exact = [r for r in ph_rows if r[5] == 0]
    sloppy = [r for r in ph_rows if r[5] > 0]
    parts = []
    if exact:
        offsets = [
            (ck, t, off)
            for (ck, _, _, _, _, _, toks) in sorted(exact)
            for off, t in enumerate(toks)
        ]
        plens = [(ck, len(toks)) for (ck, _, _, _, _, _, toks) in sorted(exact)]
        off_df = F.broadcast(
            inline_table(spark, offsets, "ck string, term string, off long")
        )
        plen_m = literal_map(dict(plens), "string", "plen long")
        parts.append(
            occ.join(off_df, "term")
            .groupBy(
                "ck", "shard", "doc_ord",
                (F.col("pos") - F.col("off")).alias("adj"),
            )
            .agg(F.count_distinct("off").alias("n_off"))
            .where(F.col("n_off") == F.element_at(plen_m, F.col("ck")))
            .select("ck", "shard", "doc_ord")
            .distinct()
        )
    if sloppy:
        slot_rows = [
            (ck, t, j, len(set(toks)))
            for (ck, _, _, _, _, _, toks) in sorted(sloppy)
            for j, t in enumerate(sorted(set(toks)))
        ]
        windows = [
            (ck, len(toks) + slop)
            for (ck, _, _, _, _, slop, toks) in sorted(sloppy)
        ]
        slots_df = F.broadcast(
            inline_table(spark, 
                slot_rows, "query_id string, term string, j int, m int"
            )
        )
        win_m = literal_map(dict(windows), "string", "win int")
        covered = (
            _min_cover_grouped(occ.join(slots_df, "term"))
            .where(F.col("min_cover") <= F.element_at(win_m, F.col("query_id")))
            .select(F.col("query_id").alias("ck"), "shard", "doc_ord")
        )
        parts.append(covered)
    matched = parts[0]
    for p in parts[1:]:
        matched = matched.unionByName(p)

    qterms = [
        (ck, t, float(c))
        for (ck, _, _, _, _, _, toks) in sorted(ph_rows)
        for t, c in sorted(Counter(toks).items())
    ]
    scores = _bm25_scores(index, qterms, bucket_of).withColumnRenamed(
        "query_id", "ck"
    )
    return matched.join(scores, ["ck", "shard", "doc_ord"]).select(
        "ck", "shard", "doc_ord", F.col("score").alias("pscore")
    )
