"""Function-score decay rescoring — the ES `function_score` decay surface
(gauss / exp / linear over a numeric document attribute: recency boosts,
distance-from-price, freshness ranking). Reference counterpart: none
in-repo — the reference reranks with a neural forward pass
(retriever/reranker.py); this is the attribute-algebra sibling that needs
no model: relevance × a closed-form decay of "how far is the doc's
attribute from the origin".

Formulas (exactly ES's, Gaussian/exponential/linear kernels):
    d       = max(0, |v - origin| - offset)          (the decayed distance)
    gauss   : exp( -d^2 / (2*sigma^2) ),  sigma^2 = -scale^2 / (2*ln(decay))
    exp     : exp( lambda * d ),          lambda  = ln(decay) / scale
    linear  : max(0, (s - d) / s),        s       = scale / (1 - decay)
so a doc AT distance `scale` from the origin scores exactly `decay`× its
base score, and a doc within `offset` keeps it untouched. A doc whose
attribute is NULL/absent gets multiplier 1.0 (ES's missing-field rule),
so sparse metadata never tanks recall.

Plan: one broadcast join of the (queries × k)-bounded run against the
projected attribute column, pure column algebra for the kernel, one
window re-rank — no UDF, no extra pass over the corpus.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_KINDS = ("gauss", "exp", "linear")


def decay_rescore(
    run: DataFrame,
    attrs: DataFrame,
    field: str,
    origin: float,
    scale: float,
    decay: float = 0.5,
    offset: float = 0.0,
    kind: str = "gauss",
    k: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — ``run`` (query_id, doc_id, score)
    rescored by score × decay(attrs[field]), re-ranked per query with the
    engine's deterministic (score DESC, doc_id ASC) tie-break; ``k``
    optionally cuts the re-ranked depth."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")

    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_base"),
    )
    av = attrs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(field).cast("double").alias("_v"),
    )
    # the run is queries×k-bounded; the attribute table is corpus-sized —
    # one semi-join pass reduces attrs to the run's doc set (broadcast of
    # the tiny id list), and the now-bounded slice broadcasts back into a
    # LEFT join so run docs with no attribute row keep multiplier 1.0
    # (the same missing-field rule as a NULL value). The corpus is
    # scanned exactly once and never shuffled.
    bounded_attrs = av.join(
        F.broadcast(base.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    hydrated = base.join(F.broadcast(bounded_attrs), "doc_id", "left")

    d = F.greatest(F.abs(F.col("_v") - F.lit(origin)) - F.lit(offset), F.lit(0.0))
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        mult = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif kind == "exp":
        lam = math.log(decay) / scale
        mult = F.exp(F.lit(lam) * d)
    else:  # linear
        s = scale / (1.0 - decay)
        mult = F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    rescored = hydrated.select(
        "query_id",
        "doc_id",
        (F.col("_base") * F.coalesce(mult, F.lit(1.0))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = rescored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank")


def boosting_rescore(
    run: DataFrame,
    negative: DataFrame,
    negative_boost: float = 0.5,
    k: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the ES/Lucene `boosting` query:
    hits of the positive query (``run``) that ALSO appear in ``negative``
    keep their relevance but are demoted by ``negative_boost``× (unlike
    must_not, which would remove them outright). negative: (doc_id) to
    demote everywhere, or (query_id, doc_id) to demote per query.

    One broadcast membership join over the (queries × k)-bounded run —
    the negative set is typically another (bounded) run or a small
    corpus-predicate selection; re-rank with the engine's deterministic
    tie-break."""
    if not 0.0 < negative_boost < 1.0:
        raise ValueError(
            f"negative_boost must be in (0, 1), got {negative_boost}"
        )
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_base"),
    )
    keys = ["doc_id"] if "query_id" not in negative.columns else [
        "query_id", "doc_id"
    ]
    neg = negative.select(
        *[F.col(c).cast("string").alias(c) for c in keys]
    ).distinct().withColumn("_neg", F.lit(1))
    joined = base.join(F.broadcast(neg), keys, "left")
    rescored = joined.select(
        "query_id",
        "doc_id",
        F.when(
            F.col("_neg").isNotNull(), F.col("_base") * F.lit(negative_boost)
        ).otherwise(F.col("_base")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = rescored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank")


FVF_MODIFIERS = ("none", "log1p", "sqrt", "square", "reciprocal")


def field_value_factor_rescore(
    run: DataFrame,
    docs: DataFrame,
    attr_col: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
    boost_mode: str = "multiply",
    k: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the ES `function_score`
    field_value_factor: fold a numeric document attribute (views, stars,
    link count, freshness score...) into the relevance score:

        fvf   = modifier(factor × attr)      attr NULL/absent -> `missing`
                modifier ∈ {none, log1p, sqrt, square, reciprocal}
        score = score × fvf  (boost_mode='multiply', ES default)
              | score + fvf  (boost_mode='sum')

    ES semantics notes carried over: `missing` substitutes for the FIELD
    value (before factor/modifier); sqrt/log1p of a negative product is
    an error in ES — here it yields NULL, which we fail loudly on rather
    than silently dropping the hit (validate your attribute's domain).

    One broadcast hydrate of the (queries × k)-bounded run against the
    docs attribute column + one window re-rank — no corpus shuffle."""
    if modifier not in FVF_MODIFIERS:
        raise ValueError(
            f"modifier must be one of {FVF_MODIFIERS}, got {modifier!r}"
        )
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(
            f"boost_mode must be 'multiply' or 'sum', got {boost_mode!r}"
        )
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_base"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.coalesce(F.col(attr_col).cast("double"), F.lit(float(missing))).alias(
            "_v"
        ),
    )
    x = F.lit(float(factor)) * F.col("_v")
    fvf = {
        "none": x,
        "log1p": F.log1p(x),
        "sqrt": F.sqrt(x),
        "square": x * x,
        "reciprocal": F.lit(1.0) / x,
    }[modifier]
    combined = (
        F.col("_base") * fvf if boost_mode == "multiply" else F.col("_base") + fvf
    )
    if round_to is not None:
        combined = F.round(combined, round_to)
    rescored = (
        attrs.join(F.broadcast(base), "doc_id")
        .select("query_id", "doc_id", combined.alias("score"))
    )
    bad = F.col("score").isNull() | F.isnan("score")
    if rescored.where(bad).limit(1).count() > 0:
        raise ValueError(
            f"field_value_factor produced NULL/NaN scores: modifier "
            f"{modifier!r} is undefined for some factor×{attr_col} values "
            "(negative log1p/sqrt or reciprocal of 0) — clamp the "
            "attribute or pick another modifier"
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = rescored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank")


_SCORE_MODES = ("multiply", "sum", "avg", "max", "min", "first")
_BOOST_MODES = ("multiply", "sum", "replace", "avg", "max", "min")
_HEX = "0123456789abcdef"


def _random_unit_col(doc_id_col: str, seed: int) -> Column:
    """Deterministic uniform [0, 1) per doc: fold the first 8 nibbles of
    the engine's portable md5 rank key (functions/hashing.py) into a
    base-16 fraction. Pure string/arithmetic algebra so DuckDB replays it
    digit by digit — no hex-parse builtin needed in either engine."""
    out = F.lit(0.0)
    for i in range(1, 9):
        d = F.expr(
            f"locate(substring(md5(concat_ws('|', '{seed}', {doc_id_col})), "
            f"{i}, 1), '{_HEX}') - 1"
        )
        out = out + d.cast("double") * F.lit(16.0 ** -i)
    return out


def function_score(
    run: DataFrame,
    attrs: DataFrame,
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    k: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the full ES `function_score`
    combiner over a ranked run: each function produces a value for the
    docs matching its optional `filter` (SQL predicate over the attribute
    columns; NULL folds to false); matching values combine via
    `score_mode` (multiply/sum/avg/max/min/first — first = first MATCHING
    function in list order, ES semantics); the combined function score
    blends with the query score via `boost_mode` (multiply/sum/replace/
    avg/max/min). If NO function matches a doc the function score is 1
    (ES's neutral element regardless of score_mode).

    Function specs (dicts):
      {"kind": "weight", "weight": w}
      {"kind": "field_value_factor", "field": f, "factor": a,
       "modifier": "none"|"log1p"|"sqrt", "missing": m}
      {"kind": "decay", "decay_kind": "gauss"|"exp"|"linear", "field": f,
       "origin": o, "scale": s, "decay": d, "offset": off}
           (NULL attribute -> 1.0, the decay surface's missing rule)
      {"kind": "random_score", "seed": n}
           (deterministic uniform [0,1) from the portable md5 rank key —
            reproducible across engines AND runs, unlike ES's default
            ctx-dependent seed)
    Every spec takes an optional "filter" and an optional "weight"
    multiplier (ES's per-function weight, default 1).

    Plan: the same bounded shape as decay_rescore — one semi-join pass
    reduces the corpus-sized attribute table to the run's docs, one
    broadcast hydrate, then pure column algebra (arrays of (value, match)
    structs folded with F.aggregate/F.filter) and one re-rank window. No
    UDF, no extra corpus pass."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if boost_mode not in _BOOST_MODES:
        raise ValueError(f"boost_mode must be one of {_BOOST_MODES}")
    if not functions:
        raise ValueError("functions must contain at least one spec")

    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_base"),
    )
    fields = sorted({
        spec["field"] for spec in functions
        if spec["kind"] in ("field_value_factor", "decay")
    })
    av = attrs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(f) for f in
          sorted(set(attrs.columns) - {"doc_id"})],
    )
    bounded = av.join(
        F.broadcast(base.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    hyd = base.join(F.broadcast(bounded), "doc_id", "left")

    structs = []
    for spec in functions:
        kind = spec["kind"]
        weight = float(spec.get("weight", 1.0))
        if kind == "weight":
            val = F.lit(1.0)
        elif kind == "field_value_factor":
            v = F.coalesce(
                F.col(spec["field"]).cast("double"),
                F.lit(float(spec.get("missing", 1.0))),
            ) * F.lit(float(spec.get("factor", 1.0)))
            modifier = spec.get("modifier", "none")
            if modifier == "log1p":
                val = F.log1p(v)
            elif modifier == "sqrt":
                val = F.sqrt(v)
            elif modifier == "none":
                val = v
            else:
                raise ValueError(f"unknown modifier {modifier!r}")
        elif kind == "decay":
            dk = spec.get("decay_kind", "gauss")
            if dk not in _KINDS:
                raise ValueError(f"decay_kind must be one of {_KINDS}")
            scale = float(spec["scale"])
            decay = float(spec.get("decay", 0.5))
            origin = float(spec["origin"])
            offset = float(spec.get("offset", 0.0))
            if scale <= 0 or not 0.0 < decay < 1.0:
                raise ValueError("decay needs scale > 0 and decay in (0,1)")
            vv = F.col(spec["field"]).cast("double")
            dist = F.greatest(
                F.abs(vv - F.lit(origin)) - F.lit(offset), F.lit(0.0)
            )
            if dk == "gauss":
                sigma2 = -(scale * scale) / (2.0 * math.log(decay))
                m = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
            elif dk == "exp":
                m = F.exp(F.lit(math.log(decay) / scale) * dist)
            else:
                s = scale / (1.0 - decay)
                m = F.greatest((F.lit(s) - dist) / F.lit(s), F.lit(0.0))
            val = F.coalesce(m, F.lit(1.0))
        elif kind == "rank_feature":
            # ES rank_feature functions over a non-negative feature field:
            #   saturation: v / (v + pivot)
            #   log:        ln(scaling_factor + v)
            #   sigmoid:    v^exp / (v^exp + pivot^exp)
            # NULL/missing feature -> 0 contribution (ES: the doc simply
            # doesn't score on the feature), negative values clamp to 0.
            fn = spec.get("function", "saturation")
            v = F.greatest(
                F.coalesce(F.col(spec["field"]).cast("double"), F.lit(0.0)),
                F.lit(0.0),
            )
            if fn == "saturation":
                pivot = float(spec["pivot"])
                if pivot <= 0:
                    raise ValueError("saturation pivot must be > 0")
                val = v / (v + F.lit(pivot))
            elif fn == "log":
                scaling = float(spec.get("scaling_factor", 1.0))
                if scaling <= 0:
                    raise ValueError("log scaling_factor must be > 0")
                val = F.log(F.lit(scaling) + v)
            elif fn == "sigmoid":
                pivot = float(spec["pivot"])
                exp = float(spec.get("exponent", 1.0))
                if pivot <= 0 or exp <= 0:
                    raise ValueError("sigmoid needs pivot > 0 and exponent > 0")
                val = F.pow(v, F.lit(exp)) / (
                    F.pow(v, F.lit(exp)) + F.lit(pivot ** exp)
                )
            else:
                raise ValueError(f"unknown rank_feature function {fn!r}")
        elif kind == "random_score":
            val = _random_unit_col("doc_id", int(spec.get("seed", 42)))
        else:
            raise ValueError(f"unknown function kind {kind!r}")
        flt = spec.get("filter")
        match = (
            F.coalesce(F.expr(flt).cast("boolean"), F.lit(False))
            if flt is not None
            else F.lit(True)
        )
        structs.append(
            F.struct(
                (val * F.lit(weight)).cast("double").alias("v"),
                match.alias("m"),
            )
        )

    arr = F.filter(F.array(*structs), lambda x: x["m"])
    n = F.size(arr)
    vals = F.transform(arr, lambda x: x["v"])
    if score_mode == "multiply":
        fs = F.aggregate(vals, F.lit(1.0), lambda acc, x: acc * x)
    elif score_mode == "sum":
        fs = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
    elif score_mode == "avg":
        fs = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x) / n
    elif score_mode == "max":
        fs = F.array_max(vals)
    elif score_mode == "min":
        fs = F.array_min(vals)
    else:  # first
        fs = F.element_at(vals, 1)
    fs = F.when(n > 0, fs).otherwise(F.lit(1.0))

    b = F.col("_base")
    if boost_mode == "multiply":
        final = b * fs
    elif boost_mode == "sum":
        final = b + fs
    elif boost_mode == "replace":
        final = fs
    elif boost_mode == "avg":
        final = (b + fs) / F.lit(2.0)
    elif boost_mode == "max":
        final = F.greatest(b, fs)
    else:
        final = F.least(b, fs)

    rescored = hyd.select("query_id", "doc_id", final.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = rescored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank")


def search_pinned(
    run: DataFrame,
    pinned: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """The ES `pinned` query over a ranked run: promoted docs come FIRST
    in their pin order (regardless of relevance), organic results follow
    in score order with pinned docs deduplicated out of the tail.
    pinned: (query_id, doc_id, pin_order) — per-query promotion lists.
    A pinned doc absent from the organic run still appears (score NULL,
    ES fetches pinned ids by id-lookup); `pinned` output column marks the
    provenance. (query_id, doc_id, score, rank, pinned).

    Pure bounded algebra: the run is queries × k bounded and the pin list
    is tiny — one broadcast outer join + one window."""
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("score"),
    )
    pins = pinned.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("pin_order").cast("int").alias("pin_order"),
    )
    merged = base.join(F.broadcast(pins), ["query_id", "doc_id"], "full_outer")
    w = Window.partitionBy("query_id").orderBy(
        # pinned block first (pin_order ASC), then organic by score
        F.when(F.col("pin_order").isNotNull(), F.lit(0)).otherwise(F.lit(1)),
        F.asc_nulls_last("pin_order"),
        F.desc_nulls_last("score"),
        F.asc("doc_id"),
    )
    out = merged.withColumn("rank", F.row_number().over(w)).withColumn(
        "pinned", F.col("pin_order").isNotNull()
    )
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank", "pinned")


def distance_feature_rescore(
    run: DataFrame,
    attrs: DataFrame,
    field: str,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    lat_lon: tuple[str, str] | None = None,
    geo_origin: tuple[float, float] | None = None,
    k: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the ES `distance_feature` query
    folded into the relevance score (ES composes it as a bool `should`
    clause, which ADDS to the BM25 score — so the fold is addition, not
    the function_score multiply):

        score' = score + boost * pivot / (pivot + distance)

    Numeric/date form: distance = |attrs[field] - origin| (dates as
    epoch numbers, same units as pivot). Geo form: pass
    lat_lon=('lat','lon') + geo_origin=(lat, lon); distance is the
    haversine km and pivot is in km. A hit missing the field
    contributes 0 boost (ES: the clause simply doesn't match), never
    NULL. Same bounded plan as decay_rescore: semi-join slice of the
    attribute table, broadcast left hydrate, one re-rank window."""
    if pivot <= 0:
        raise ValueError(f"pivot must be positive, got {pivot}")
    if (lat_lon is None) != (geo_origin is None):
        raise ValueError("geo form needs BOTH lat_lon and geo_origin")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_base"),
    )
    if lat_lon is None:
        av = attrs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(field).cast("double").alias("_v"),
        )
        dist = F.abs(F.col("_v") - F.lit(float(origin)))
    else:
        from openmatch_spark.functions.geo import haversine_km

        av = attrs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(lat_lon[0]).cast("double").alias("_lat"),
            F.col(lat_lon[1]).cast("double").alias("_lon"),
        )
        dist = F.when(
            F.col("_lat").isNotNull() & F.col("_lon").isNotNull(),
            haversine_km("_lat", "_lon", geo_origin[0], geo_origin[1]),
        )
    bounded = av.join(
        F.broadcast(base.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    hydrated = base.join(F.broadcast(bounded), "doc_id", "left")
    feature = F.lit(float(boost)) * F.lit(float(pivot)) / (
        F.lit(float(pivot)) + dist
    )
    rescored = hydrated.select(
        "query_id", "doc_id",
        (F.col("_base") + F.coalesce(feature, F.lit(0.0))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    out = rescored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("query_id", "doc_id", "score", "rank")
