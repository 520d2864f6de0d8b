"""Federated multi-index search — query/federated.py.

Contract under test:
  * search_federated over K doc-disjoint member indexes is BIT-IDENTICAL
    (ids, ranks, float64 scores) to one fresh index built over the union
    corpus — the Lucene MultiReader global-stats semantic.
  * a term out-of-vocabulary in one member still scores via the others,
    and its global df counts only the members that have it.
  * member tombstones (delete_docs) are honored.
  * heterogeneous members (different analyzer / scoring) are refused.
  * federated_stats reports the union's frozen stats.
"""

import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.index.deletes import delete_docs
from openmatch_spark.query import search, search_federated
from openmatch_spark.query.federated import federated_stats

QUERIES = [
    ("q0", "term0000 term0000 term0001"),  # duplicate head term
    ("q1", "zzznotinvocab term0002"),      # OOV everywhere
    ("q2", "term0003 term0040"),
    ("q3", "term0100"),                    # rarer tail term
]


@pytest.fixture(scope="module")
def fed(spark, tmp_path_factory):
    """Union index + 3 disjoint member indexes over thirds of the corpus,
    with DIFFERENT shard/bucket geometry per member (geometry must not
    matter to federation)."""
    root = tmp_path_factory.mktemp("fed")
    rows = gen_pages_rows(240, vocab=400)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    union_dir = str(root / "union")
    build_index(spark, pages, union_dir, analyzer="simple",
                num_shards=3, num_term_buckets=8, block_size=64)
    members = []
    geom = [(1, 4, 32), (2, 8, 64), (3, 2, 128)]
    for i in range(3):
        part = spark.createDataFrame(rows[i::3], PAGES_SCHEMA)
        d = str(root / f"m{i}")
        ns, nb, bs = geom[i]
        build_index(spark, part, d, analyzer="simple",
                    num_shards=ns, num_term_buckets=nb, block_size=bs)
        members.append(d)
    return union_dir, members, rows


def _run(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()
    )


def test_federated_matches_union_build(spark, fed):
    union_dir, members, _ = fed
    queries = spark.createDataFrame(QUERIES, QUERIES_SCHEMA)
    want = _run(search(load_index(spark, union_dir), queries, k=10))
    idxs = [load_index(spark, d) for d in members]
    got = _run(search_federated(idxs, queries, k=10))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        # float64 bit-identity: same expressions, same canonical term order
        assert g[3] == w[3], (g, w)


def test_single_member_equals_its_own_search(spark, fed):
    _, members, _ = fed
    queries = spark.createDataFrame(QUERIES, QUERIES_SCHEMA)
    idx = load_index(spark, members[0])
    assert _run(search_federated([idx], queries, k=10)) == _run(
        search(idx, queries, k=10)
    )


def test_term_missing_from_one_member_still_scores(spark, fed):
    """A term present in only SOME members must rank docs from those members
    with df summed over the members that have it — build a member whose
    corpus lacks a marker term and check the other member serves it."""
    _, members, _ = fed
    marker_rows = [
        ("https://m.example/1", None, b"", "qqmarker shared0 shared1", "en"),
        ("https://m.example/2", None, b"", "shared0 shared1 shared2", "en"),
    ]
    plain_rows = [
        ("https://p.example/1", None, b"", "shared0 shared1 shared2", "en"),
    ]
    import tempfile

    d1 = tempfile.mkdtemp(prefix="fed_m1_")
    d2 = tempfile.mkdtemp(prefix="fed_m2_")
    du = tempfile.mkdtemp(prefix="fed_u_")
    build_index(spark, spark.createDataFrame(marker_rows, PAGES_SCHEMA), d1,
                analyzer="simple", num_shards=1, num_term_buckets=2)
    build_index(spark, spark.createDataFrame(plain_rows, PAGES_SCHEMA), d2,
                analyzer="simple", num_shards=1, num_term_buckets=2)
    build_index(
        spark,
        spark.createDataFrame(marker_rows + plain_rows, PAGES_SCHEMA),
        du, analyzer="simple", num_shards=1, num_term_buckets=2,
    )
    queries = spark.createDataFrame(
        [("qa", "qqmarker shared0")], QUERIES_SCHEMA
    )
    got = _run(search_federated(
        [load_index(spark, d1), load_index(spark, d2)], queries, k=10))
    want = _run(search(load_index(spark, du), queries, k=10))
    assert got == want
    assert any(d == "https://m.example/1" for (_, _, d, _) in got)


def test_member_deletes_honored(spark, fed):
    union_dir, members, _ = fed
    queries = spark.createDataFrame([("q3", "term0100")], QUERIES_SCHEMA)
    idxs = [load_index(spark, d) for d in members]
    before = _run(search_federated(idxs, queries, k=5))
    assert before, "fixture query must match something"
    victim = before[0][2]
    target = None
    for d in members:
        # docmap is a property returning a fresh plan per access — bind once
        dm = load_index(spark, d).docmap
        if dm.where(dm.doc_id == victim).count():
            target = d
            delete_docs(spark, d, [victim])
            break
    assert target is not None
    idxs = [load_index(spark, d) for d in members]
    after = _run(search_federated(idxs, queries, k=5))
    assert all(doc != victim for (_, _, doc, _) in after)
    # survivors keep their (frozen-stat) scores: delete does not rebaseline
    before_scores = {d: s for (_, _, d, s) in before}
    for (_, _, d, s) in after:
        if d in before_scores:
            assert s == before_scores[d]


def test_heterogeneous_members_refused(spark, fed):
    _, members, rows = fed
    import tempfile

    d = tempfile.mkdtemp(prefix="fed_dpr_")
    build_index(
        spark, spark.createDataFrame(rows[:30], PAGES_SCHEMA), d,
        analyzer="dpr", num_shards=1, num_term_buckets=2,
    )
    idxs = [load_index(spark, members[0]), load_index(spark, d)]
    with pytest.raises(ValueError, match="analyzer"):
        search_federated(idxs, spark.createDataFrame(QUERIES, QUERIES_SCHEMA))

    dq = tempfile.mkdtemp(prefix="fed_qld_")
    build_index(
        spark, spark.createDataFrame(rows[:30], PAGES_SCHEMA), dq,
        analyzer="simple", num_shards=1, num_term_buckets=2, scoring="qld",
    )
    idxs = [load_index(spark, members[0]), load_index(spark, dq)]
    with pytest.raises(ValueError, match="qld"):
        search_federated(idxs, spark.createDataFrame(QUERIES, QUERIES_SCHEMA))


def test_federated_stats_match_union(spark, fed):
    union_dir, members, _ = fed
    union = load_index(spark, union_dir).stats
    got = federated_stats([load_index(spark, d) for d in members])
    assert got["n_docs"] == int(union["n_docs"])
    assert got["total_terms"] == int(union["total_terms"])
    assert abs(got["avgdl"] - float(union["avgdl"])) < 1e-9
    assert got["members"] == 3
