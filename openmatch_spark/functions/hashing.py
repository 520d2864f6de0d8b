"""Portable deterministic hashing helpers.

The driver cross-checks Spark results against DuckDB, so any hash used in a
checked query must compute identically in both engines. ``md5`` over UTF-8
produces the same lowercase hex in Spark, DuckDB, and Python's hashlib —
hex-string *ordering* is then a portable deterministic pseudo-random order
(used for seeded sampling T4, MinHash-style signatures, and salting).

The reference seeds hard-negative shuffling with wall-clock
(scripts/msmarco/build_hn.py:42) — we deliberately fix the seed instead
(FIXTURES.md determinism rules).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column


def md5_rank_col(*cols: Column | str, seed: int = 42) -> Column:
    """Deterministic portable pseudo-random sort key.

    Spark:  md5(concat_ws('|', seed, cols...))
    DuckDB: md5(concat_ws('|', seed, cols...))  — identical hex.
    """
    parts = [F.lit(str(seed))] + [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def md5_rank_py(*vals, seed: int = 42) -> str:
    s = "|".join([str(seed)] + [str(v) for v in vals])
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_rank_sql(*exprs: str, seed: int = 42) -> str:
    """DuckDB SQL text for the same key."""
    inner = ", ".join(["'%d'" % seed] + [f"CAST({e} AS VARCHAR)" for e in exprs])
    return f"md5(concat_ws('|', {inner}))"
