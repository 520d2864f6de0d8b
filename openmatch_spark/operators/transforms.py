"""Row-level projections/transforms from the reference (SURVEY §2.2, §2.8).

- fill_template: the reference's template renderer (utils.py:212-227
  find_all_markers, utils.py:230-259 fill_template): ``<marker>`` holes are
  replaced by row fields; dotted paths descend into struct columns; missing
  markers render as "" (allow_not_found semantics). Built as a pure Column
  concat — whole-stage codegen, no UDF.
- robust04_clean: `re.sub(r"[^A-Za-z0-9=(),!?\\'\\`]", " ")` + whitespace
  squeeze (docs/BEIR-Evaluation.md:12-17).
- random_crop: seeded token-window crop (data_augmentation_strategy.py:18-29)
  with the wall-clock seed replaced by a deterministic md5-derived offset.
- softmax / log_softmax over per-query score groups (reranker.py:131-132,
  dense_retrieval_model.py:137-138) as window algebra (W4).
- hydrate_run: attach doc/query text to a run (J1/J2,
  dense_retriever.py:262-283, reranker.py:63-77).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_MARKER = re.compile(r"<([^<>]+)>")


def find_all_markers(template: str) -> list[str]:
    """Marker names in template order (utils.py:212-227)."""
    return _MARKER.findall(template)


def fill_template_col(
    template: str, df_columns: list[str], allow_not_found: bool = True
) -> Column:
    """Column expression rendering the template for each row.

    Dotted markers (`<a.b>`) access struct fields; markers naming absent
    columns render "" when allow_not_found (the reference warns +
    substitutes "", utils.py:246-257) and raise a ValueError at plan time
    otherwise (utils.py:252-255 `allow_not_found=False` strict mode).
    """
    parts: list[Column] = []
    pos = 0
    for m in _MARKER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        root = name.split(".")[0]
        if root in df_columns:
            parts.append(F.coalesce(F.col(name).cast("string"), F.lit("")))
        elif allow_not_found:
            parts.append(F.lit(""))
        else:
            raise ValueError(
                f"marker <{name}> not found in columns {sorted(df_columns)}"
            )
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def fill_template(
    df: DataFrame, template: str, out: str = "rendered",
    allow_not_found: bool = True,
) -> DataFrame:
    return df.withColumn(
        out, fill_template_col(template, df.columns, allow_not_found)
    )


def robust04_clean_col(col: Column) -> Column:
    cleaned = F.regexp_replace(col, r"[^A-Za-z0-9=(),!?'`]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def random_crop_col(arr: Column, crop_len: int, seed: int = 42) -> Column:
    """Deterministic 'random' crop: offset = md5-derived value mod the valid
    range (reference crops at a wall-clock-random offset; we pin it)."""
    n = F.size(arr)
    span = F.greatest(n - crop_len + 1, F.lit(1))
    # first 8 hex chars of md5 of the array content -> stable pseudo-random
    h = F.conv(F.substring(F.md5(F.concat_ws("", arr)), 1, 8), 16, 10).cast("long")
    start = (F.lit(seed) + h) % span + 1
    return F.when(n <= crop_len, arr).otherwise(F.slice(arr, start, crop_len))


def softmax_scores(run: DataFrame, log: bool = False, score_col: str = "score") -> DataFrame:
    """Per-query softmax (or log-softmax) of scores, numerically stabilized
    by the per-group max (W4)."""
    w = Window.partitionBy("query_id")
    shifted = F.col(score_col) - F.max(score_col).over(w)
    denom = F.sum(F.exp(shifted)).over(w)
    out = (shifted - F.log(denom)) if log else (F.exp(shifted) / denom)
    return run.withColumn(f"{score_col}_softmax", out)


def margin_col(pos_score: Column, neg_score: Column) -> Column:
    """MarginMSE-style label margin (build_train_marginmse.py:53)."""
    return pos_score - neg_score


def hydrate_run(
    run: DataFrame,
    corpus: DataFrame | None = None,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Attach doc text (J1) and/or query text (J2) to a run.

    Queries broadcast (always small); the corpus join is a plain equi join —
    at scale the run side is the small one, so Catalyst/AQE broadcasts it
    against the corpus scan instead of shuffling the corpus.
    """
    out = run
    if corpus is not None:
        out = out.join(
            corpus.select(F.col("doc_id").cast("string").alias("doc_id"),
                          F.col("text").alias("doc_text")),
            "doc_id",
        )
    if queries is not None:
        out = out.join(
            F.broadcast(
                queries.select(F.col("query_id").cast("string").alias("query_id"),
                               F.col("text").alias("query_text"))
            ),
            "query_id",
        )
    return out


def canonical_url_col(url: Column) -> Column:
    """Canonical form of a web url — THE dedup/join key normalization a
    Common-Crawl-style pipeline applies before url-keyed stages (the same
    page arrives as http://Site.com/a?utm_source=x and https://site.com/a/
    across crawls). Pure column algebra (regexp + lower + concat, one
    codegen pass), rules chosen to be expressible IDENTICALLY in the
    DuckDB oracle (no parse_url, which DuckDB lacks):

      1. trim; strip the #fragment;
      2. lowercase scheme and host (never path/query — those are
         case-sensitive by RFC 3986);
      3. drop default ports (http :80, https :443);
      4. drop tracking params (utm_*, gclid, fbclid, msclkid) and tidy the
         leftover ?/& separators;
      5. strip trailing slashes.

    Scheme-less strings pass through steps 1 only (nothing to split on).
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    tail = F.regexp_replace(after, r"^[^/?#]*", "")
    # tracking params must be anchored at a ?/& separator and the key must
    # match in full (an unanchored key-substring match would mangle legit
    # params like wgclid=, and the [^&#]* value class would even eat '/'
    # path segments when the pattern matched inside a PATH — e.g.
    # '/utm_a=1/page'). The separator is captured and re-emitted; residual
    # '&&' / '?&' runs are tidied below.
    tail = F.regexp_replace(
        tail, r"([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)=[^&#]*", r"$1"
    )
    tail = F.regexp_replace(tail, r"&&+", "&")
    tail = F.regexp_replace(tail, r"\?&", "?")
    tail = F.regexp_replace(tail, r"[?&]+$", "")
    # trailing-slash strip applies to the PATH only: when a query string is
    # present the final chars belong to a query VALUE ('?next=/home/') and
    # stripping them would conflate distinct urls
    tail = F.when(tail.contains("?"), tail).otherwise(
        F.regexp_replace(tail, r"/+$", "")
    )
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, tail)
    )


def url_dedup_key_col(url: Column) -> Column:
    """Dedup-KEY variant of canonical_url_col: additionally folds the
    http/https scheme split by dropping an http(s):// prefix from the
    canonical form — the same page served over both protocols is one page
    for dedup purposes, but canonical_url itself keeps the scheme (it is a
    display/join identity, not an equivalence class). Non-web schemes stay
    distinct."""
    return F.regexp_replace(canonical_url_col(url), r"^https?://", "")
