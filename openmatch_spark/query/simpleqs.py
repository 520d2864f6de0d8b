"""ES simple_query_string — the lenient one-string front door (Lucene
SimpleQueryParser) compiled onto the engine's verified clause executor.

The reference's users reach Anserini/Lucene through exactly this kind of
forgiving end-user syntax; this module gives the engine the same surface
with the same discipline as query/querystring.py: parsing is driver-side
and deterministic, execution is the shared `_execute_clauses` plan (one
postings decode + one broadcast clause join + one (query, doc) aggregate;
positional sidecar only for phrase clauses; exclusions anti-joined after
aggregation).

Grammar (Lucene SimpleQueryParser's documented operators):

  `|`    OR junction between segments
  `+`    AND junction between segments
  `-`    negation prefix on one segment
  `"…"`  phrase; `"…"~N` sloppy phrase (NEAR)
  `tok*` prefix (trailing `*` only)
  `tok~N` fuzzy (Levenshtein budget N, default 2 when N omitted)
  whitespace = the `default_operator` junction ("or" | "and")

Lenient by contract — this parser NEVER raises on query text: dangling
operators are dropped, an unbalanced quote is dropped and its text parsed
as terms, empty segments vanish, consecutive junction operators collapse
(last one wins). Parentheses/PRECEDENCE and `\\` ESCAPE are not supported
(documented deviation, same stance as query_string's grammar subset);
`(` `)` `\\` are stripped by analysis like any other non-token char.

A segment whose text ANALYZES to several tokens ('foo-bar', or 'a|b'
with OR disabled) follows Lucene's newDefaultQuery: the tokens combine
under the default_operator — with 'or' they form one boolean unit that
matches when any token matches (OOV tokens drop alone), with 'and'
every token is its own MUST. A negated multi-token segment excludes
docs matching ANY of its tokens under either operator (documented
conservative deviation).

`flags` disables features exactly like ES's simple_query_string flags:
a disabled operator char is treated as plain text and falls through to
the analyzer. Supported flag names: AND, OR, NOT, PREFIX, PHRASE, FUZZY,
NEAR, plus ALL / NONE.

Boolean composition (Lucene SimpleQueryParser's shape):

  * AND binds tighter than OR: the segment sequence splits into AND-runs
    at OR junctions — `a + b | c` is (a AND b) OR c;
  * each AND-run with >= 1 positive segment becomes one BRANCH: positives
    are MUST, run-local negations MUST_NOT (`b + -c | d` excludes c only
    from the b-branch);
  * an all-negative run lifts to a TOP-LEVEL exclusion applied to every
    branch (`-a b` = docs matching b and not a — Lucene adds bare
    negations to the top boolean, not to a sibling branch);
  * a query with no positive segment matches nothing (a boolean of only
    MUST_NOT clauses can never rank);
  * a branch whose MUST clause is unsatisfiable (OOV term, zero
    expansions, phrase with an OOV token) dies ALONE — the other branches
    still match (this is where simple_query_string differs from
    query_string, whose single boolean dies wholesale);
  * score = Σ over MATCHING branches of the branch's clause-sum BM25
    (Lucene's nested-boolean SHOULD sum; a doc matching several branches
    accumulates all of them);
  * minimum_should_match counts MATCHED BRANCHES (the top boolean's
    should clauses). With a single branch there is no top-level should
    list and the parameter is ignored (Lucene returns the bare group).

Execution: every branch runs as its own subquery (composite id
qid\\x1fbranch) through ONE `_execute_clauses` call with finalize=False,
so the whole batch still compiles to a single declarative plan; the
branch sum is one extra (query, doc) aggregate over the candidate set,
and the top-k cut + hydration happen once, after the sum — a doc that no
single branch ranks highly can still win on the sum, which a per-branch
top-k would silently lose.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.phrase import _finalize
from openmatch_spark.functions.localrel import inline_table
from openmatch_spark.query.querystring import (
    _CAND_SCHEMA,
    _RUN_SCHEMA,
    _SEP,
    Clause,
    _analyzed,
    _execute_clauses,
)

ALL_FLAGS = frozenset({"AND", "OR", "NOT", "PREFIX", "PHRASE", "FUZZY", "NEAR"})

_TERM_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")


@dataclass(frozen=True)
class Segment:
    """One parsed segment, pre-analysis."""
    neg: bool
    kind: str  # 'term' | 'phrase' | 'prefix' | 'fuzzy'
    text: str
    slop: int = 0
    edits: int = 2


def resolve_flags(flags) -> frozenset:
    """'ALL' | 'NONE' | iterable of flag names -> the enabled-feature set.
    Unknown names raise (flags are API arguments, not query text — the
    leniency contract covers only the query string itself)."""
    if flags is None or flags == "ALL":
        return ALL_FLAGS
    if flags == "NONE":
        return frozenset()
    if isinstance(flags, str):
        flags = [f for f in re.split(r"[|,\s]+", flags) if f]
    out = frozenset(f.upper() for f in flags)
    if "ALL" in out:
        return ALL_FLAGS
    if "NONE" in out:
        out = out - {"NONE"}
    unknown = out - ALL_FLAGS
    if unknown:
        raise ValueError(
            f"unknown simple_query_string flags: {sorted(unknown)} "
            f"(supported: {sorted(ALL_FLAGS)}, ALL, NONE)"
        )
    return out


def _lex(s: str, flags: frozenset):
    """Query text -> token stream: ('OR',) / ('AND',) / ('SEG', Segment).
    Lenient — never raises."""
    toks: list = []
    i, n = 0, len(s or "")
    carry_neg = False  # negation surviving a dropped unbalanced quote
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            carry_neg = False
            continue
        if c == "|" and "OR" in flags:
            toks.append(("OR",))
            i += 1
            carry_neg = False
            continue
        if c == "+" and "AND" in flags:
            toks.append(("AND",))
            i += 1
            carry_neg = False
            continue
        neg = carry_neg
        carry_neg = False
        if c == "-" and "NOT" in flags:
            # negation only when it prefixes segment text; a bare '-' is a
            # dangling operator and is dropped
            if i + 1 < n and not s[i + 1].isspace() and s[i + 1] not in "|+-":
                neg = True
                i += 1
                c = s[i]
            else:
                i += 1
                continue
        if c == '"' and "PHRASE" in flags:
            j = s.find('"', i + 1)
            if j < 0:
                # unbalanced quote: drop it, keep scanning the text with
                # the negation (if any) carried onto the next segment
                i += 1
                carry_neg = neg
                continue
            body = s[i + 1:j]
            i = j + 1
            slop = 0
            if i < n and s[i] == "~" and "NEAR" in flags:
                m = re.match(r"~(\d+)", s[i:])
                if m:
                    slop = int(m.group(1))
                    i += len(m.group(0))
            if body.strip():
                toks.append(("SEG", Segment(neg, "phrase", body, slop=slop)))
            continue
        # bare term: accumulate until a junction/whitespace/phrase boundary
        j = i
        stop = set()
        if "OR" in flags:
            stop.add("|")
        if "AND" in flags:
            stop.add("+")
        if "PHRASE" in flags:
            stop.add('"')
        while j < n and not s[j].isspace() and s[j] not in stop:
            j += 1
        word = s[i:j]
        i = j
        if not word:
            continue
        if "PREFIX" in flags and word.endswith("*") and len(word) > 1 \
                and "*" not in word[:-1]:
            toks.append(("SEG", Segment(neg, "prefix", word[:-1])))
            continue
        m = _TERM_FUZZY_RE.match(word) if "FUZZY" in flags else None
        if m and "*" not in word:
            toks.append(
                # Lucene FuzzyQuery caps maxEdits at 2; leniency contract
                # forbids raising on query text, so clamp silently
                ("SEG", Segment(neg, "fuzzy", m.group(1),
                                edits=min(int(m.group(2) or 2), 2)))
            )
            continue
        toks.append(("SEG", Segment(neg, "term", word)))
    return toks


def parse_simple_query_string(
    s: str, default_operator: str = "or", flags="ALL"
) -> tuple[list[list[Segment]], list[Segment]]:
    """One query string -> (branches, global_nots).

    branches: AND-runs with >= 1 positive segment (the OR-of-AND-groups
    decomposition; module docstring). global_nots: negated segments from
    all-negative runs, to exclude from every branch. Pure, deterministic,
    lenient — never raises on query text."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    fl = resolve_flags(flags)
    toks = _lex(s, fl)
    # fold the token stream into (junction, segment) with implicit
    # default-operator junctions; dangling/consecutive operators collapse
    seq: list = []  # (junction or None, Segment)
    pending = None
    for t in toks:
        if t[0] in ("OR", "AND"):
            if seq:  # leading operators are dangling — drop
                pending = t[0]
            continue
        junction = pending if pending else default_operator.upper()
        seq.append((junction if seq else None, t[1]))
        pending = None
    # split into AND-runs at OR junctions
    runs: list[list[Segment]] = []
    for junction, seg in seq:
        if junction == "OR" or not runs:
            runs.append([seg])
        else:
            runs[-1].append(seg)
    branches = [r for r in runs if any(not sg.neg for sg in r)]
    global_nots = [sg for r in runs if all(sg.neg for sg in r) for sg in r]
    return branches, global_nots


def _segment_clause(seg: Segment, role: str, group: int = -1) -> Clause:
    if seg.kind == "phrase":
        return Clause(role, "phrase", seg.text, 1.0, slop=seg.slop,
                      group=group)
    if seg.kind == "fuzzy":
        return Clause(role, "fuzzy", seg.text, 1.0, edits=seg.edits,
                      group=group)
    return Clause(role, seg.kind, seg.text, 1.0, group=group)


def search_simple_query_string(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    default_operator: str = "or",
    flags="ALL",
    minimum_should_match: int = 0,
    max_expansions: int = 50,
    fuzzy_prefix_len: int = 1,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) for simple_query_string
    text. queries: (query_id, text). Semantics, leniency, and plan shape
    per the module docstring; expansion caps and orderings are
    query/expand.py's (shared with every expansion surface)."""
    spark = index.spark
    analyzer = index.stats["analyzer"]
    if minimum_should_match < 0:
        raise ValueError(
            f"minimum_should_match must be >= 0, got {minimum_should_match}"
        )
    rows = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect()
    per_branch: dict = {}
    n_branches: dict = {}
    for r in rows:
        qid = str(r["query_id"])
        if _SEP in qid:
            raise ValueError(f"query_id must not contain \\x1f: {qid!r}")
        branches, gnots = parse_simple_query_string(
            r["text"] or "", default_operator, flags
        )
        live = 0
        for b, run in enumerate(branches):
            # under default_operator 'or', a SEGMENT is one boolean unit:
            # its analyzed tokens share a Clause.group, so a multi-token
            # segment ('foo-bar', or 'a|b' with OR disabled) matches when
            # ANY token matches and its OOV tokens drop alone — Lucene's
            # newDefaultQuery builds the nested match query with the
            # default operator. Under 'and' every token is its own MUST
            # (same rule), so no grouping. Negated multi-token segments
            # always exclude on ANY token (documented conservative
            # deviation — the per-term anti-join cannot express AND).
            # Clause.group's contract: group all of a query's clauses or
            # none — so the global nots are grouped too (ids above the
            # run's) exactly when the positives are.
            if default_operator == "or":
                clauses = [
                    _segment_clause(sg, "must_not" if sg.neg else "must",
                                    group=gi)
                    for gi, sg in enumerate(run)
                ] + [
                    _segment_clause(sg, "must_not", group=len(run) + j)
                    for j, sg in enumerate(gnots)
                ]
            else:
                clauses = [
                    _segment_clause(sg, "must_not" if sg.neg else "must")
                    for sg in run
                ] + [_segment_clause(sg, "must_not") for sg in gnots]
            analyzed = _analyzed(clauses, analyzer)
            if any(c.role == "must" for c in analyzed):
                per_branch[f"{qid}{_SEP}{live}"] = analyzed
                live += 1
        n_branches[qid] = live
    if not per_branch:
        return spark.createDataFrame([], _RUN_SCHEMA)

    cand = _execute_clauses(
        index, per_branch, k, 0, max_expansions, fuzzy_prefix_len,
        finalize=False,
    )
    split = F.split(F.col("query_id"), _SEP, 2)
    summed = (
        cand.select(
            split[0].alias("query_id"),
            split[1].alias("branch"),
            "shard", "doc_ord", "score",
        )
        .groupBy("query_id", "shard", "doc_ord")
        .agg(
            F.sum("score").alias("score"),
            F.count_distinct("branch").alias("n_matched"),
        )
    )
    if minimum_should_match > 0:
        # count MATCHED branches; single-branch queries are exempt (no
        # top-level should list exists — module docstring)
        multi = [(q, n) for q, n in sorted(n_branches.items()) if n > 1]
        if multi:
            mdf = F.broadcast(
                inline_table(spark, multi, "query_id string, nb int")
            )
            summed = (
                summed.join(mdf, "query_id", "left")
                .where(
                    F.col("nb").isNull()
                    | (F.col("n_matched") >= minimum_should_match)
                )
                .drop("nb")
            )
    return _finalize(
        index, summed.select("query_id", "shard", "doc_ord", "score"), k, []
    )
