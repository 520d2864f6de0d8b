"""Index-time synonym contraction via the analyzer string."""

import tempfile

import pytest

from openmatch_spark.analysis import (
    make_synonym_analyzer,
    split_synonym_analyzer,
    tokenize_col,
    tokenize_py,
)

GROUPS = {"large": ["big", "huge"], "rapid": ["fast", "quick"]}


def test_analyzer_string_roundtrip_and_validation():
    a = make_synonym_analyzer("simple", GROUPS)
    assert a == "simple|syn=large:big,huge;rapid:fast,quick"
    base, mapping = split_synonym_analyzer(a)
    assert base == "simple"
    assert mapping == {"big": "large", "huge": "large",
                       "fast": "rapid", "quick": "rapid"}
    assert split_synonym_analyzer("simple") == ("simple", None)
    # canonical order + variant order are canonicalized
    assert make_synonym_analyzer(
        "simple", {"rapid": ["quick", "fast"], "large": ["huge", "big"]}
    ) == a
    with pytest.raises(ValueError, match="single-token"):
        make_synonym_analyzer("simple", {"large": ["very big"]})
    with pytest.raises(ValueError, match="appears in groups"):
        make_synonym_analyzer("simple", {"a1": ["big"], "b2": ["big"]})
    with pytest.raises(ValueError, match="no distinct variants"):
        make_synonym_analyzer("simple", {"large": ["large"]})
    with pytest.raises(ValueError, match="unknown analyzer"):
        make_synonym_analyzer("nope", GROUPS)
    with pytest.raises(ValueError, match="already carries"):
        make_synonym_analyzer(a, GROUPS)


def test_tokenize_py_col_parity(spark):
    import pyspark.sql.functions as F

    a = make_synonym_analyzer("simple", GROUPS)
    texts = [
        "A BIG fast table", "huge huge quick", "nothing to map here", ""
    ]
    py = [tokenize_py(t, a) for t in texts]
    assert py[0] == ["a", "large", "rapid", "table"]
    assert py[1] == ["large", "large", "rapid"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [r["toks"] for r in
           df.select(tokenize_col(F.col("text"), a).alias("toks")).collect()]
    assert jvm == py
    # stemming composes: base analyzer runs FIRST ('tables' -> 'table')
    eng = make_synonym_analyzer("english", {"table": ["grid"]})
    assert tokenize_py("tables grids", eng) == ["table", "table"]


def test_synonym_index_equals_presubstituted_corpus(spark):
    """Searching a synonym index == searching a base index over text with
    the variants substituted by hand — score-identical, not just rank."""
    import pyspark.sql.functions as F

    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search

    docs = [
        ("doc://0", "big table scan on a huge table"),
        ("doc://1", "fast merge beats slow merge"),
        ("doc://2", "quick quick value"),
        ("doc://3", "nothing relevant"),
    ]
    sub = {"big": "large", "huge": "large", "fast": "rapid", "quick": "rapid"}

    def pages(rows):
        return spark.createDataFrame(
            [(u, None, None, t, "en") for u, t in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    d_syn = tempfile.mkdtemp(prefix="om_syn_")
    build_index(
        spark, pages(docs), d_syn,
        analyzer=make_synonym_analyzer("simple", GROUPS),
        num_shards=2, num_term_buckets=4, block_size=8,
    )
    hand = [(u, " ".join(sub.get(w, w) for w in t.split())) for u, t in docs]
    d_base = tempfile.mkdtemp(prefix="om_synbase_")
    build_index(
        spark, pages(hand), d_base, analyzer="simple",
        num_shards=2, num_term_buckets=4, block_size=8,
    )
    qrows = [("q0", "large table"), ("q1", "fast value"), ("q2", "rapid merge")]

    def rows(d, queries):
        q = spark.createDataFrame(queries, "query_id string, text string")
        return sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
            for r in search(load_index(spark, d), q, k=5).collect()
        )

    # the base index needs the substitution applied to the QUERIES too —
    # on the synonym index the analyzer does it on both sides
    hand_q = [(i, " ".join(sub.get(w, w) for w in t.split())) for i, t in qrows]
    got, want = rows(d_syn, qrows), rows(d_base, hand_q)
    assert got == want
    # and the variant-term query actually matched contracted docs
    assert any(r[0] == "q0" and r[1] == "doc://0" for r in got)
