"""IndexStorage both-branch test (SURVEY §7.4): the same build and query
code runs against catalog tables (here the built-in session catalog with
parquet provider — an Iceberg catalog is one conf away and shares the V2
writeTo branch) and against plain parquet paths, producing identical runs.
"""

from __future__ import annotations

import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows, gen_queries_rows
from openmatch_spark.index import IndexStorage, build_index, load_index
from openmatch_spark.query import search


def _run_rows(run):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in run.collect()
    )


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(gen_pages_rows(120, seed=11), PAGES_SCHEMA)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(gen_queries_rows(4, seed=3), QUERIES_SCHEMA)


def test_table_mode_equals_path_mode(spark, pages, queries, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("storage")
    # path mode (sandbox default)
    d_path = str(tmp / "idx_path")
    build_index(spark, pages, d_path, num_shards=2, num_term_buckets=2, block_size=16)
    run_path = _run_rows(search(load_index(spark, d_path), queries, k=5))

    # table mode: session catalog, parquet provider, V1 writers
    prefix = "spark_catalog.default.om_storage_test"
    d_tbl = str(tmp / "idx_tbl")  # still holds stats.json
    try:
        build_index(
            spark, pages, d_tbl, num_shards=2, num_term_buckets=2,
            block_size=16, table_prefix=prefix,
        )
        from openmatch_spark.index.storage import KINDS
        for kind in KINDS:
            if kind in ("positions", "deletes"):
                # optional sidecars: build_index does NOT create them
                # (positions via build_positions, deletes via delete_docs)
                assert not spark.catalog.tableExists(f"{prefix}_{kind}")
                continue
            assert spark.catalog.tableExists(f"{prefix}_{kind}")
        idx = load_index(spark, d_tbl, table_prefix=prefix)
        run_tbl = _run_rows(search(idx, queries, k=5))
        assert run_tbl == run_path
        # positional sidecar works in table mode too: build it, phrase-search,
        # and confirm store.drop removes the catalog table (the compaction
        # invalidation path)
        from openmatch_spark.index import build_positions
        from openmatch_spark.index.storage import IndexStorage
        from openmatch_spark.query import search_phrase

        build_positions(spark, pages, d_tbl, table_prefix=prefix)
        assert spark.catalog.tableExists(f"{prefix}_positions")
        idx = load_index(spark, d_tbl, table_prefix=prefix)
        assert idx.has_positions()
        hits = search_phrase(idx, queries, k=5)
        assert hits.columns == ["query_id", "doc_id", "score", "rank", "phrase_freq"]
        hits.count()  # executes the positional plan against catalog tables
        IndexStorage.resolve(spark, d_tbl, table_prefix=prefix).drop("positions")
        assert not spark.catalog.tableExists(f"{prefix}_positions")
        # deletes sidecar works in table mode too: tombstone one hit and
        # confirm it leaves the run while the catalog table appears
        from openmatch_spark.index import delete_docs

        victim = run_tbl[0][1]  # (query_id, doc_id, score, rank) ordering
        delete_docs(spark, d_tbl, [victim], table_prefix=prefix)
        assert spark.catalog.tableExists(f"{prefix}_deletes")
        idx = load_index(spark, d_tbl, table_prefix=prefix)
        run_del = _run_rows(search(idx, queries, k=5))
        assert victim not in {r[1] for r in run_del}
    finally:
        from openmatch_spark.index.storage import KINDS as _K
        for kind in _K:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{kind}")


def test_table_mode_multibatch_dynamic_overwrite(spark, pages, queries, tmp_path_factory):
    """Multi-batch builds exercise the dynamic-partition-overwrite branch
    (insertInto / overwritePartitions): later batches must not clobber
    earlier shards' rows."""
    tmp = tmp_path_factory.mktemp("storage_mb")
    d_path = str(tmp / "idx_path")
    build_index(spark, pages, d_path, num_shards=4, num_term_buckets=2, block_size=16)
    run_path = _run_rows(search(load_index(spark, d_path), queries, k=5))

    prefix = "spark_catalog.default.om_storage_mb"
    d_tbl = str(tmp / "idx_tbl")
    try:
        build_index(
            spark, pages, d_tbl, num_shards=4, num_term_buckets=2,
            block_size=16, table_prefix=prefix, shard_batch_size=2,
        )
        idx = load_index(spark, d_tbl, table_prefix=prefix)
        assert idx.manifest.count() == 4
        run_tbl = _run_rows(search(idx, queries, k=5))
        assert run_tbl == run_path
    finally:
        from openmatch_spark.index.storage import KINDS as _K
        for kind in _K:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{kind}")


def test_resolve_prefers_explicit_then_conf(spark, tmp_path):
    st = IndexStorage.resolve(spark, str(tmp_path / "x"))
    assert not st.is_table_mode  # no catalog configured in-sandbox
    st2 = IndexStorage.resolve(spark, str(tmp_path / "x"), table_prefix="c.db.t")
    assert st2.is_table_mode and st2.table_name("postings") == "c.db.t_postings"


def test_v2_branch_dispatch(spark, tmp_path, monkeypatch):
    """The V2 (Iceberg-style) writer branch, exercised against a MOCK
    catalog: no Iceberg jar exists in the sandbox, so this verifies the
    dispatch logic — which writeTo verb fires per overwrite-mode conf, the
    partitionedBy plumbing, append-vs-create, and the transactional DELETE
    — rather than real table IO (the real-iceberg path shares these exact
    lines; VERDICT r2 'What's missing' #4)."""
    spark.conf.set("spark.sql.catalog.mockcat", "org.example.FakeCatalog")
    try:
        store = IndexStorage.resolve(
            spark, str(tmp_path / "v2"), table_prefix="mockcat.db.idx",
            table_format="iceberg",
        )
        assert store.is_table_mode and store._v2

        calls = {}

        class FakeWriter:
            def __init__(self, name):
                calls["table"] = name

            def using(self, fmt):
                calls["using"] = fmt
                return self

            def partitionedBy(self, *cols):
                calls["partitionedBy"] = len(cols)
                return self

            def overwritePartitions(self):
                calls["mode"] = "overwritePartitions"

            def createOrReplace(self):
                calls["mode"] = "createOrReplace"

            def append(self):
                calls["mode"] = "append"

            def create(self):
                calls["mode"] = "create"

        df = spark.range(3).selectExpr("cast(id as int) as shard")
        # patch the CONCRETE DataFrame class (pyspark 4 routes through
        # pyspark.sql.classic.DataFrame; patching the abstract base is a no-op)
        monkeypatch.setattr(
            type(df), "writeTo", lambda self, name: FakeWriter(name)
        )

        # static mode -> createOrReplace with partitioning
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        store.overwrite(df, "docmap", ["shard"])
        assert calls["mode"] == "createOrReplace"
        assert calls["using"] == "iceberg" and calls["partitionedBy"] == 1
        assert calls["table"] == "mockcat.db.idx_docmap"

        # dynamic mode + existing table -> overwritePartitions
        monkeypatch.setattr(spark.catalog, "tableExists", lambda name: True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        store.overwrite(df, "docmap", ["shard"])
        assert calls["mode"] == "overwritePartitions"

        # append on an existing table -> append; on a missing one -> create
        store.append(df, "metrics")
        assert calls["mode"] == "append"
        monkeypatch.setattr(spark.catalog, "tableExists", lambda name: False)
        store.append(df, "metrics")
        assert calls["mode"] == "create"

        # delete_partitions -> one transactional DELETE
        monkeypatch.setattr(spark.catalog, "tableExists", lambda name: True)
        sqls = []
        monkeypatch.setattr(spark, "sql", lambda q, **kw: sqls.append(q))
        store.delete_partitions("postings", "shard", [1, 2])
        assert sqls == ["DELETE FROM mockcat.db.idx_postings WHERE shard IN (1, 2)"]
    finally:
        spark.conf.unset("spark.sql.catalog.mockcat")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
