"""Round-4 additions: ADVICE fixes, projection-only repetition family,
salted bucket pairing, url-keyed dedup, incremental near-dup store, dense
brute-force routing, curate->index pipeline."""

import os

import pytest
import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------


def test_null_text_reports_zero_counts(spark):
    """NULL text must read as empty (0 counts), not the F.size -1 sentinel."""
    from openmatch_spark.operators.textstats import (
        gopher_quality_flags,
        repetition_signals,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", "hello world\nhello world")],
        "doc_id string, text string",
    )
    g = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert g["a"]["n_words"] == 0
    assert g["a"]["gopher_pass"] == 0
    r = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert r["a"]["n_lines"] == 0
    assert r["a"]["dup_line_ratio"] == 0.0
    assert r["b"]["dup_line_ratio"] == 0.5


def test_cc_warns_when_unconverged(spark):
    from openmatch_spark.operators.dedup import connected_components_min_label

    # a 6-chain cannot converge in one round even with path halving
    edges = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(6)], "doc_a string, doc_b string"
    )
    with pytest.warns(RuntimeWarning, match="not converged"):
        connected_components_min_label(edges, max_iters=1)
    # and with the default budget the same chain fully converges, silently
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        comp = connected_components_min_label(edges)
    rows = {r["doc_id"]: r["component"] for r in comp.collect()}
    assert set(rows.values()) == {"d0"}


def test_storage_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the two aside-swap renames leaves scratch+aside and no
    live dir; the next read must finish the commit forward."""
    from openmatch_spark.index.layout import IndexPaths
    from openmatch_spark.index.storage import IndexStorage

    root = str(tmp_path / "idx")
    st = IndexStorage(spark=spark, paths=IndexPaths(root))
    old = spark.createDataFrame([("t1", 1)], "term string, df int")
    new = spark.createDataFrame([("t2", 2)], "term string, df int")
    st.overwrite(old, "dictionary")
    # simulate the crash window: full scratch write done, live dir renamed
    # aside, second rename never happened
    new.write.mode("overwrite").parquet(os.path.join(root, "_stage_dictionary"))
    os.rename(st.paths.dictionary, os.path.join(root, "_old_dictionary"))
    assert st.exists("dictionary")  # recovery runs inside exists/read
    got = [(r["term"], r["df"]) for r in st.read("dictionary").collect()]
    assert got == [("t2", 2)]
    assert not os.path.exists(os.path.join(root, "_old_dictionary"))
    assert not os.path.exists(os.path.join(root, "_stage_dictionary"))
