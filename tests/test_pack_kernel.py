"""Unit tests for the sort-based posting packer kernel (index/build.py).

Feeds Arrow batches straight into the mapInArrow kernel with a tiny flush
buffer so run-crossing-flush edge cases (exact block-multiple runs, giant
runs, key change on a batch seam) are exercised deterministically, and
compares against a trivial single-pass reference encoder.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import openmatch_spark.index.build as build_mod
from openmatch_spark.functions.codec import decode_postings
from openmatch_spark.index.build import _pack_blocks_arrow

IN_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("term_bucket", pa.int32()),
        ("doc_ord", pa.int64()),
        ("weight", pa.float64()),
    ]
)


def _make_batches(runs, batch_rows):
    """runs: list of (shard, term, n_postings). Rows sorted by construction."""
    shard, term, ords, w = [], [], [], []
    for s, t, n in runs:
        shard += [s] * n
        term += [t] * n
        ords += list(range(10, 10 + 3 * n, 3))
        w += [0.5 + 0.001 * i for i in range(n)]
    tbl = pa.table(
        {
            "shard": pa.array(shard, pa.int32()),
            "term": pa.array(term, pa.string()),
            "term_bucket": pa.array([0] * len(shard), pa.int32()),
            "doc_ord": pa.array(ords, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    return tbl.to_batches(max_chunksize=batch_rows), tbl


def _reference_blocks(tbl, bs):
    """Single-pass reference: dict (shard, term) -> list of block dicts."""
    shard = tbl.column("shard").to_numpy()
    term = tbl.column("term").to_numpy(zero_copy_only=False)
    ords = tbl.column("doc_ord").to_numpy()
    w = tbl.column("weight").to_numpy()
    out = {}
    i = 0
    n = len(ords)
    while i < n:
        j = i
        while j < n and term[j] == term[i] and shard[j] == shard[i]:
            j += 1
        blocks = []
        for b0 in range(i, j, bs):
            b1 = min(b0 + bs, j)
            blocks.append(
                dict(
                    block_id=(b0 - i) // bs,
                    first_ord=int(ords[b0]),
                    last_ord=int(ords[b1 - 1]),
                    n=b1 - b0,
                    max_score=float(w[b0:b1].max()),
                    ords=ords[b0:b1].tolist(),
                    weights=w[b0:b1].tolist(),
                )
            )
        out[(int(shard[i]), term[i])] = blocks
        i = j
    return out


def _kernel_blocks(batches, bs):
    got = {}
    for rb in _pack_blocks_arrow(bs)(iter(batches)):
        d = rb.to_pydict()
        for idx in range(rb.num_rows):
            key = (d["shard"][idx], d["term"][idx])
            got.setdefault(key, []).append(
                dict(
                    block_id=d["block_id"][idx],
                    first_ord=d["first_ord"][idx],
                    last_ord=d["last_ord"][idx],
                    n=d["n"][idx],
                    max_score=d["max_score"][idx],
                    ords=decode_postings(d["docs"][idx]).tolist(),
                    weights=np.frombuffer(d["scores"][idx], dtype=np.float64).tolist(),
                )
            )
    for blocks in got.values():
        blocks.sort(key=lambda b: b["block_id"])
    return got


@pytest.mark.parametrize(
    "runs",
    [
        # run length an exact multiple of block size, crossing flush seams
        [(0, "a", 64), (0, "b", 32), (1, "a", 7)],
        # giant run spanning many flushes
        [(0, "big", 500)],
        # giant run whose length is an exact block multiple
        [(0, "big", 512), (0, "c", 3)],
        # many tiny runs (tail-term regime)
        [(0, f"t{i:03d}", 1 + i % 5) for i in range(60)],
        # key change exactly on a batch seam (batch_rows=16 divides 48)
        [(0, "a", 48), (0, "b", 48)],
    ],
)
def test_kernel_matches_reference(monkeypatch, runs):
    bs = 16
    monkeypatch.setattr(build_mod, "_PACK_BUFFER_ROWS", 40)
    batches, tbl = _make_batches(runs, batch_rows=16)
    assert _kernel_blocks(batches, bs) == _reference_blocks(tbl, bs)


def test_kernel_single_batch_equals_many(monkeypatch):
    runs = [(0, "x", 130), (0, "y", 16), (1, "x", 33)]
    bs = 16
    monkeypatch.setattr(build_mod, "_PACK_BUFFER_ROWS", 32)
    many, tbl = _make_batches(runs, batch_rows=8)
    got_many = _kernel_blocks(many, bs)
    monkeypatch.setattr(build_mod, "_PACK_BUFFER_ROWS", 1 << 17)
    one, _ = _make_batches(runs, batch_rows=10**9)
    got_one = _kernel_blocks(one, bs)
    assert got_many == got_one == _reference_blocks(tbl, bs)
