"""ES `frequent_item_sets` aggregation: which (field, value) items
co-occur in the same documents more often than a support threshold —
level-wise apriori expressed as joins.

Algorithm (classic SQL apriori, level k bounded by max_set_size):
  transactions  (doc, item) with item = '<field>:<value>', NULLs skipped
  L1            items with doc_count >= minimum_support * n_txns
  S_k           S_{k-1} (docs' frequent (k-1)-prefixes) extended by a
                frequent single item LEXICOGRAPHICALLY AFTER the prefix's
                last item — every set is generated exactly once, in
                sorted-item order
  L_k           extensions whose doc_count clears the same threshold;
                S_k is then pruned to L_k before the next level (the
                apriori closure: an infrequent set cannot extend into a
                frequent one)

ES semantics kept: support = doc_count / total transactions, items may
repeat across overlapping sets, output ranked doc_count DESC (key ASC
tiebreak — ES leaves ties unspecified; a total order keeps this
oracle-comparable), minimum_set_size filters the OUTPUT only (smaller
sets still seed extension, as in ES). ES's closed-set filtering knob is
not implemented (documented out; ES itself calls it approximate).

Scale shape: each level is one equi-join of the surviving prefix rows
against the per-doc frequent items plus one groupBy — both bounded by
(docs x frequent items per doc), never by the value-combination space;
the only driver interaction is the per-level row count used to stop
early. Item strings must not contain the ',' join separator (field
names and categorical values here never do; guarded)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def frequent_item_sets(
    df: DataFrame,
    item_cols: dict[str, Column | str],
    id_col: str = "doc_id",
    minimum_support: float = 0.1,
    minimum_set_size: int = 1,
    max_set_size: int = 3,
    size: int = 10,
) -> DataFrame:
    """(items, set_size, doc_count, support, rank) — the top `size`
    frequent item sets, items a comma-joined sorted '<field>:<value>'
    list. item_cols: {field_name: column}; values cast to string."""
    if not item_cols:
        raise ValueError("item_cols must name at least one field")
    if not 0.0 < minimum_support <= 1.0:
        raise ValueError(
            f"minimum_support must be in (0, 1], got {minimum_support}"
        )
    if minimum_set_size < 1 or max_set_size < minimum_set_size:
        raise ValueError(
            f"need 1 <= minimum_set_size <= max_set_size, got "
            f"{minimum_set_size}..{max_set_size}"
        )
    txn = None
    for name in sorted(item_cols):
        c = item_cols[name]
        col = F.col(c) if isinstance(c, str) else c
        part = df.select(
            F.col(id_col).cast("string").alias("txn"),
            F.concat(F.lit(f"{name}:"), col.cast("string")).alias("item"),
        ).where(col.isNotNull())
        txn = part if txn is None else txn.unionByName(part)
    txn = txn.where(~F.col("item").contains(",")).distinct().persist()
    n_txns = df.select(F.col(id_col).cast("string")).distinct().count()
    if n_txns == 0:
        return df.sparkSession.createDataFrame(
            [], "items string, set_size int, doc_count long, "
                "support double, rank int"
        )
    threshold = float(minimum_support) * float(n_txns)

    counts1 = txn.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count")
    )
    l1 = counts1.where(F.col("doc_count") >= F.lit(threshold))
    # per-doc frequent single items — the extension pool for every level
    fitems = txn.join(F.broadcast(l1.select("item")), "item").persist()
    levels = [
        l1.select(
            F.col("item").alias("items"),
            F.lit(1).cast("int").alias("set_size"),
            "doc_count",
        )
    ]
    # surviving prefixes: (txn, items, last)
    state = fitems.select(
        "txn", F.col("item").alias("items"), F.col("item").alias("last")
    )
    for k in range(2, max_set_size + 1):
        ext = (
            state.join(
                fitems.select("txn", F.col("item").alias("_nxt")), "txn"
            )
            .where(F.col("_nxt") > F.col("last"))
            .select(
                "txn",
                F.concat_ws(",", "items", "_nxt").alias("items"),
                F.col("_nxt").alias("last"),
            )
        )
        counts_k = ext.groupBy("items").agg(
            F.count(F.lit(1)).cast("long").alias("doc_count")
        )
        lk = counts_k.where(F.col("doc_count") >= F.lit(threshold))
        if lk.limit(1).count() == 0:
            break
        levels.append(
            lk.select(
                "items", F.lit(k).cast("int").alias("set_size"), "doc_count"
            )
        )
        state = ext.join(F.broadcast(lk.select("items")), "items")
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.where(F.col("set_size") >= F.lit(int(minimum_set_size)))
    w = Window.orderBy(F.desc("doc_count"), F.asc("items"))
    return (
        out.withColumn(
            "support", F.col("doc_count") / F.lit(float(n_txns))
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= size)
        .select("items", "set_size", "doc_count", "support", "rank")
    )
