"""JVM-local plans for small driver-held tables (query batches, clause
tables, per-node gate metadata).

PySpark's createDataFrame parallelizes rows into a pickled Python RDD, so
every use — a probe, a broadcast build, a join — pays a Python-worker
round trip and an RDD job (measured ~0.5-1.4 s per broadcast join of a
50-500-row table on local[32]). For the engine's many tiny driver-held
metadata tables that cost dominates small-batch query latency. These
helpers keep the rows in the JVM instead:

  inline_table(spark, rows, ddl)  — one JSON literal + from_json + inline
      over range(1): a pure-JVM one-task plan, ~3x cheaper to broadcast
      than the RDD-backed equivalent and with zero Python workers in the
      broadcast build. Falls back to createDataFrame above a row cap
      (a multi-MB literal in the plan stops paying for itself) or when a
      float is non-finite (JSON cannot carry NaN/Inf portably).

  literal_map(entries, key_ddl, value_ddl) — map_from_entries over the
      same JSON-literal trick, for one-to-one lookup tables that replace
      a broadcast join outright (element_at + isNotNull filter ==
      inner equi-join on a unique key): no broadcast stage, no join.

JSON round-trips are exact for the types these tables carry: Python
json.dumps emits shortest-round-trip decimals for floats (repr), which
parse back to the identical double; strings are escaped by the JSON
layer (no SQL-literal quoting hazards); ints are exact within int64.
"""

from __future__ import annotations

import json
import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, StructType

# above this many rows the JSON literal stops being the cheap path
# (plan-embedded multi-MB strings); createDataFrame distributes instead
_INLINE_MAX_ROWS = 20_000


def _ddl_struct(ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(ddl)
    if not isinstance(st, StructType):
        raise ValueError(f"expected a struct DDL, got {ddl!r}")
    return st


def _finite(rows) -> bool:
    for r in rows:
        for v in r:
            if isinstance(v, float) and not math.isfinite(v):
                return False
    return True


def inline_table(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """DataFrame over driver-held `rows` (sequence of tuples/lists matching
    the DDL column order) built as a JVM-local plan; results identical to
    spark.createDataFrame(rows, ddl) in every consumer."""
    rows = list(rows)
    if len(rows) > _INLINE_MAX_ROWS or not _finite(rows):
        return spark.createDataFrame(rows, ddl)
    st = _ddl_struct(ddl)
    names = st.fieldNames()
    payload = json.dumps(
        [dict(zip(names, r)) for r in rows], ensure_ascii=False,
        default=lambda o: o.item(),  # numpy scalars ride along
    )
    return spark.range(1).select(
        F.inline(F.from_json(F.lit(payload), ArrayType(st)))
    )


def literal_map(entries: dict, key_ddl: str, value_ddl: str):
    """Column: a literal map {key -> value} for one-to-one lookup tables.
    `entries` values may be scalars (value_ddl names one type, e.g.
    'v double') or tuples matching a multi-field value_ddl (the value
    becomes a struct; read fields with col.getField/struct access).
    Use element_at(literal_map(...), key_col); a missing key yields NULL,
    so `.where(lookup.isNotNull())` reproduces an inner join's filtering.
    """
    vst = _ddl_struct(value_ddl)
    vnames = vst.fieldNames()
    scalar = len(vnames) == 1
    ents = []
    for k, v in entries.items():
        vv = {vnames[0]: v} if scalar else dict(zip(vnames, v))
        ents.append({"key": k, "value": vv})
    kt = _ddl_struct(f"key {key_ddl}").fields[0].dataType
    st = StructType().add("key", kt).add("value", vst)
    payload = json.dumps(ents, ensure_ascii=False)
    m = F.map_from_entries(F.from_json(F.lit(payload), ArrayType(st)))
    if scalar:
        return F.transform_values(m, lambda _, v: v.getField(vnames[0]))
    return m


def in_list(col: str, values) -> "F.Column":
    """``F.col(col).isin(values)`` as ONE parsed SQL expression.

    Column.isin builds a py4j Literal per element (~3 ms each), which
    dominates driver-side plan construction for the engine's pruned-scan
    predicates once term lists reach a few hundred entries. Parsing a
    single ``col IN ('a', 'b', ...)`` string yields the identical In
    predicate — same semantics, same parquet PushedFilters — in one py4j
    round trip.

    col must be a plain column NAME (it is backtick-quoted); values must
    be strings or ints (the only key types the pruned scans use). String
    literals are backslash-escaped for Spark's default (non-ANSI,
    non-escapedStringLiterals) parser. An empty list returns lit(False)
    — the same rows-drop behavior isin gives inside a filter, which is
    the only place the engine uses this.
    """
    vals = list(values)
    if not vals:
        return F.lit(False)
    parts = []
    for v in vals:
        if isinstance(v, bool) or not isinstance(v, (str, int)):
            raise TypeError(
                f"in_list carries str/int values only, got {type(v).__name__}"
            )
        if isinstance(v, str):
            parts.append(
                "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
            )
        else:
            parts.append(str(v))
    return F.expr(f"`{col}` IN ({', '.join(parts)})")


def local_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """``spark.createDataFrame(rows, ddl)`` routed through the Arrow
    LocalRelation fast path.

    The tuple-list path parallelizes rows into a pickled Python RDD split
    across defaultParallelism partitions, so EVERY downstream action — the
    engine's take()-probes included — pays one Python-runner task per
    partition (~0.3 s per action on local[32]). Routing the same rows
    through a pandas frame (dtype=object so None survives in numeric
    columns) makes Spark build a driver-held LocalRelation: take/collect
    run with ZERO Spark jobs, and the values and schema are identical
    (A/B-tested incl. arrays, nulls, mixed ints/floats).

    The one semantic difference is non-finite floats (the pandas path
    turns NaN into null), so any row carrying one falls back to the
    classic path unchanged.
    """
    rows = list(rows)
    st = _ddl_struct(ddl)
    if rows and _finite_deep(rows):
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=st.fieldNames(), dtype=object)
        return spark.createDataFrame(pdf, st)
    return spark.createDataFrame(rows, st)


def _finite_deep(rows) -> bool:
    def ok(v) -> bool:
        if isinstance(v, float):
            return math.isfinite(v)
        if isinstance(v, (list, tuple)):
            return all(ok(x) for x in v)
        return True

    return all(ok(v) for r in rows for v in r)
