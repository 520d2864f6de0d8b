"""Dense top-k (brute force + IVF) vs numpy oracle; multimodal plumbing."""

import numpy as np
import pytest

from openmatch_spark.operators.multimodal import (
    DecoderUnavailable,
    as_media_table,
    decode_features,
    frame_sample,
)
from openmatch_spark.query.dense import assign_buckets, brute_force_topk, ivf_topk

DIM = 16
N = 200


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    return rng.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    rows = [(str(i), [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<float>").repartition(5)


def _numpy_topk(vectors, q, k):
    M = vectors.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    qq = np.asarray(q, dtype=np.float64)
    qq = qq / np.linalg.norm(qq)
    s = M @ qq
    order = sorted(range(N), key=lambda i: (-s[i], str(i)))[:k]
    return [(str(i), s[i]) for i in order]


def test_brute_force_matches_numpy(spark, emb_df, vectors):
    queries = [("q0", [float(x) for x in vectors[0]]), ("q1", [float(x) for x in vectors[17]])]
    run = brute_force_topk(emb_df, queries, k=10, metric="cosine").collect()
    got = {}
    for r in run:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["score"]))
    for qid, vec in queries:
        expected = _numpy_topk(vectors, vec, 10)
        mine = sorted(got[qid])
        assert [v for (_, v, _) in mine] == [v for (v, _) in expected]
        for (_, _, s), (_, es) in zip(mine, expected):
            assert s == pytest.approx(es, abs=1e-9)
    assert got["q0"][0][1] == "0" and got["q0"][0][2] == pytest.approx(1.0)


def test_ivf_recall_vs_brute_force(spark, emb_df, vectors):
    bucketed = assign_buckets(emb_df, dim=DIM, n_centroids=8).cache()
    assert bucketed.count() == N
    queries = [(f"q{i}", [float(x) for x in vectors[i * 3]]) for i in range(5)]
    approx = ivf_topk(bucketed, queries, dim=DIM, k=10, n_centroids=8, nprobe=4)
    exact = brute_force_topk(emb_df, queries, k=10)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.5  # nprobe=4 of 8 buckets: expect most of top-k found


def test_media_decode_stub(spark):
    df = spark.createDataFrame(
        [("m1", bytearray(b"\x89PNGfakebytes")), ("m2", bytearray(b"RIFFfakewav"))],
        "id string, payload binary",
    )
    media = as_media_table(df, "id", "payload", "image")
    feats = decode_features(media).collect()
    rows = {r["media_id"]: r for r in feats}
    assert rows["m1"]["n_bytes"] == 13
    assert len(rows["m1"]["feature"]) == 8
    assert rows["m1"]["width"] >= 1 and rows["m1"]["content_hash"] != rows["m2"]["content_hash"]
    # determinism
    again = {r["media_id"]: r["feature"] for r in decode_features(media).collect()}
    assert again["m1"] == rows["m1"]["feature"]


def test_media_strict_decoder_raises(spark):
    df = spark.createDataFrame([("m1", bytearray(b"x"))], "id string, payload binary")
    media = as_media_table(df, "id", "payload", "video")
    with pytest.raises(Exception) as ei:
        decode_features(media, decoder="strict").collect()
    assert "DecoderUnavailable" in str(ei.value) or "no video decoder" in str(ei.value)


def test_frame_sample(spark):
    feats = spark.createDataFrame(
        [("v1", "video", 10, "s", 1, 1, 12, [0.0])],
        "media_id string, kind string, n_bytes long, content_hash string, width int, height int, n_frames int, feature array<float>",
    )
    idx = sorted(r["frame_idx"] for r in frame_sample(feats, every_n=5).collect())
    assert idx == [0, 5, 10]


def test_mean_pool_masked_vs_numpy(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from openmatch_spark.query.dense import mean_pool_col

    rows = [
        ([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], [1, 1, 0]),
        ([[2.0, 2.0], [4.0, 8.0]], [1, 1]),
        ([[7.0, 1.0]], [0]),  # all-masked: denom clamps to 1 -> zero vector
    ]
    df = spark.createDataFrame(rows, "embs array<array<double>>, mask array<int>")
    got = [r["pooled"] for r in df.select(
        mean_pool_col(F.col("embs"), F.col("mask")).alias("pooled")
    ).collect()]
    for (embs, mask), g in zip(rows, got):
        m = np.asarray(mask, dtype=bool)
        e = np.asarray(embs)
        want = e[m].sum(axis=0) / max(m.sum(), 1)
        assert np.allclose(g, want), (g, want.tolist())

    # mask=None -> plain mean
    got2 = df.select(mean_pool_col(F.col("embs")).alias("p")).collect()
    assert np.allclose(got2[0]["p"], np.asarray(rows[0][0]).mean(axis=0))


def test_kmeans_centroids_improve_recall(spark):
    """Trained centroids must beat (or match) random-projection centroids on
    recall@10 vs brute force at the same nprobe (VERDICT r1 item 8)."""
    import numpy as np

    from openmatch_spark.query.dense import (
        _centroids,
        assign_buckets,
        brute_force_topk,
        ivf_topk,
        train_centroids_kmeans,
    )

    rng = np.random.default_rng(7)
    # clustered data: k-means should carve real cells
    centers = rng.standard_normal((6, 16)) * 3
    vecs = [
        (str(i), (centers[i % 6] + rng.standard_normal(16) * 0.5).tolist())
        for i in range(600)
    ]
    emb = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
    queries = [(f"q{i}", vecs[i * 37][1]) for i in range(8)]
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(C):
        b = assign_buckets(emb, dim=16, n_centroids=6, centroids=C)
        approx = ivf_topk(b, queries, dim=16, k=10, n_centroids=6, nprobe=2, centroids=C)
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        return len(a & exact) / len(exact)

    trained = train_centroids_kmeans(emb, n_centroids=6, sample_size=600, iters=8)
    r_trained = recall(trained)
    r_random = recall(_centroids(16, 6))
    assert r_trained >= r_random
    assert r_trained >= 0.8  # clustered data: trained cells ~lossless at nprobe=2


def test_read_media_dir(spark, tmp_path):
    from openmatch_spark.operators.multimodal import decode_features, read_media_dir

    (tmp_path / "a.png").write_bytes(b"\x89PNGfake_a")
    (tmp_path / "b.png").write_bytes(b"\x89PNGfake_bb")
    (tmp_path / "notes.txt").write_bytes(b"skip me")
    media = read_media_dir(spark, str(tmp_path), kind="image", glob="*.png")
    rows = {r["media_id"].split("/")[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"]["n_bytes"] == 10 and bytes(rows["a.png"]["payload"]).startswith(b"\x89PNG")
    feats = decode_features(media)
    assert feats.count() == 2 and len(feats.first()["feature"]) == 8
