"""Template fill (P1), robust04 cleanup (P7), crop (F11), softmax (W4),
hydration (J1/J2)."""

import math

import pytest
import pyspark.sql.functions as F

from openmatch_spark.operators.transforms import (
    fill_template,
    find_all_markers,
    hydrate_run,
    random_crop_col,
    robust04_clean_col,
    softmax_scores,
)


def test_find_all_markers():
    assert find_all_markers("Title: <title> Text: <text>") == ["title", "text"]


def test_fill_template(spark):
    df = spark.createDataFrame([("t1", "b1"), (None, "b2")], "title string, body string")
    out = fill_template(df, "Title: <title> Text: <body>").collect()
    assert out[0]["rendered"] == "Title: t1 Text: b1"
    # missing value -> "" (utils.py:246-257 allow_not_found)
    assert out[1]["rendered"] == "Title:  Text: b2"


def test_fill_template_missing_column(spark):
    df = spark.createDataFrame([("x",)], "a string")
    out = fill_template(df, "<a>|<nope>|end").collect()
    assert out[0]["rendered"] == "x||end"


def test_fill_template_struct_path(spark):
    df = spark.createDataFrame([((1, "inner"),)], "s struct<x:int, y:string>")
    out = fill_template(df, "v=<s.y>").collect()
    assert out[0]["rendered"] == "v=inner"


def test_robust04_clean(spark):
    df = spark.createDataFrame([("a&b   c#d (x), y!",)], "t string")
    got = df.select(robust04_clean_col(F.col("t")).alias("c")).collect()[0]["c"]
    assert got == "a b c d (x), y!"


def test_random_crop_deterministic(spark):
    df = spark.createDataFrame([(list("abcdefghij"),)], "arr array<string>")
    a = df.select(random_crop_col(F.col("arr"), 4).alias("c")).collect()[0]["c"]
    b = df.select(random_crop_col(F.col("arr"), 4).alias("c")).collect()[0]["c"]
    assert a == b and len(a) == 4
    short = spark.createDataFrame([(["x", "y"],)], "arr array<string>")
    assert short.select(random_crop_col(F.col("arr"), 4).alias("c")).collect()[0]["c"] == ["x", "y"]


def test_softmax(spark):
    run = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 2.0), ("q2", "c", 5.0)],
        "query_id string, doc_id string, score double",
    )
    rows = {(r["query_id"], r["doc_id"]): r["score_softmax"] for r in softmax_scores(run).collect()}
    e1, e2 = math.exp(1.0), math.exp(2.0)
    assert rows[("q1", "a")] == pytest.approx(e1 / (e1 + e2))
    assert rows[("q2", "c")] == pytest.approx(1.0)
    logrows = {(r["query_id"], r["doc_id"]): r["score_softmax"] for r in softmax_scores(run, log=True).collect()}
    assert logrows[("q1", "b")] == pytest.approx(math.log(e2 / (e1 + e2)))


def test_hydrate_run(spark):
    run = spark.createDataFrame([("q1", "d1", 1.0)], "query_id string, doc_id string, score double")
    corpus = spark.createDataFrame([("d1", "doc text")], "doc_id string, text string")
    queries = spark.createDataFrame([("q1", "query text")], "query_id string, text string")
    row = hydrate_run(run, corpus, queries).collect()[0]
    assert row["doc_text"] == "doc text" and row["query_text"] == "query text"


def test_fill_template_strict_mode_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("t", "b")], "title string, body string")
    # permissive: unknown marker renders "" (reference allow_not_found=True)
    ok = fill_template(df, "<title>|<nope>").first()["rendered"]
    assert ok == "t|"
    # strict: reference utils.py:252-255 raises on a missing marker
    with _pytest.raises(ValueError, match="nope"):
        fill_template(df, "<title>|<nope>", allow_not_found=False)


def test_canonical_url(spark):
    import pyspark.sql.functions as F

    from openmatch_spark.operators.transforms import canonical_url_col

    cases = [
        # (raw, expected)
        ("HTTP://Example.COM:80/Path/To/Page?utm_source=x&id=3&fbclid=zz#frag",
         "http://example.com/Path/To/Page?id=3"),
        ("https://Site.com:443/a/", "https://site.com/a"),
        ("https://site.com/a?utm_campaign=c", "https://site.com/a"),
        # the slash is not trailing when a query follows it — kept
        ("https://site.com/?utm_a=1&b=2&utm_c=3", "https://site.com/?b=2"),
        ("https://site.com:8080/x", "https://site.com:8080/x"),  # non-default port kept
        ("  https://site.com/x  ", "https://site.com/x"),
        ("ftp://Host/Dir/", "ftp://host/Dir"),
        ("no-scheme-string#frag", "no-scheme-string"),
        ("https://site.com/CaseSensitive/Path", "https://site.com/CaseSensitive/Path"),
        # adversarial cases from review: a legit param whose name merely
        # CONTAINS a tracking key must survive; 'utm_' appearing in a PATH
        # segment must not eat the rest of the path; a query VALUE ending
        # in '/' must keep it (only path-trailing slashes are stripped)
        ("https://site.com/?wgclid=abc&id=2", "https://site.com/?wgclid=abc&id=2"),
        ("https://site.com/utm_a=1/page", "https://site.com/utm_a=1/page"),
        ("https://site.com/p?next=/home/", "https://site.com/p?next=/home/"),
        ("https://site.com/a?utm_x=1&utm_y=2", "https://site.com/a"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r["canon"]
        for r in df.select(canonical_url_col(F.col("url")).alias("canon")).collect()
    ]
    assert got == [e for _, e in cases]
