"""Round-4 session additions: random_sampler aggregation (this file grows
with the session's later surfaces)."""

import pytest

import pyspark.sql.functions as F

from openmatch_spark.functions.hashing import md5_rank_py
from openmatch_spark.operators.sampling import (
    random_sampler,
    random_sampler_counts,
)


def _py_uniform(doc_id, seed):
    return int(md5_rank_py(doc_id, seed=seed)[:8], 16) / 4294967296.0


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:04d}", ["en", "de", "fr"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_random_sampler_matches_python_replica(spark, docs):
    got = {r["doc_id"] for r in random_sampler(docs, 0.3, seed=9).collect()}
    want = {
        f"d{i:04d}" for i in range(600) if _py_uniform(f"d{i:04d}", 9) < 0.3
    }
    assert got == want
    # rate lands near p (hash-uniform draw; wide tolerance, deterministic)
    assert 0.2 < len(got) / 600 < 0.4


def test_random_sampler_partitioning_invariance(spark, docs):
    a = {r["doc_id"] for r in random_sampler(docs, 0.5, seed=3).collect()}
    b = {
        r["doc_id"]
        for r in random_sampler(docs.repartition(13), 0.5, seed=3).collect()
    }
    assert a == b


def test_random_sampler_counts_scaling(spark, docs):
    out = {
        r["value"]: (r["n_sampled"], r["n_docs_est"])
        for r in random_sampler_counts(docs, "lang", 0.25, seed=5).collect()
    }
    kept = [
        ["en", "de", "fr"][i % 3]
        for i in range(600)
        if _py_uniform(f"d{i:04d}", 5) < 0.25
    ]
    for lang in set(kept):
        n = kept.count(lang)
        assert out[lang] == (n, round(n / 0.25, 6))
    assert set(out) == set(kept)


def test_random_sampler_probability_one_keeps_all(spark, docs):
    assert random_sampler(docs, 1.0).count() == 600


def test_random_sampler_validation(spark, docs):
    for p in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="probability"):
            random_sampler(docs, p)
