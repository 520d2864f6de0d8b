"""Large-scale training-data deduplication operators.

No direct reference counterpart (OpenMatch consumes pre-cleaned corpora);
these are the corpus-preparation ops a 100 TB web-text pipeline needs before
indexing. All hashes are md5-based so every SQL-expressible variant can be
cross-checked bit-for-bit against the DuckDB oracle (functions/hashing.py).

Scale notes:
- exact: one groupBy on a 32-byte hash — shuffle is O(corpus keys), no skew
  (md5 keys are uniform).
- minhash LSH: signature computation is an explode+min agg (map-side combine
  collapses each doc's shingles before shuffle); candidate pairs come from a
  self-join on (band, band_hash) buckets, so the cross product is per-bucket,
  never global. Bucket skew (boilerplate pages) is bounded by the max_bucket
  cap: oversized buckets are excluded from pairing and surfaced as whole
  duplicate groups instead (_capped_bucket_pairs / oversized_buckets).
- simhash: pure-JVM 64-bit fingerprints (tf-weighted md5 bit mixing);
  near-dup = Hamming distance <= d via banding on 4 x 16-bit chunks
  (pigeonhole: d<=3 pairs share at least one exact chunk), same bucket cap.
- embedding cosine: cosine_neardup_bucketed — multi-probe IVF cells for
  candidates, exact zip_with cosine to verify; linear in corpus + cells.
- canonical groups: deduplicate_corpus(closure=True) resolves duplicate
  CHAINS to union-find roots via connected_components_min_label
  (min-label propagation + pointer jumping over the edge set only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.analysis import tokenize_col


def normalized_text(col, analyzer: str = "simple"):
    """Canonical text for exact dedup: lowercase tokens joined by one space
    (whitespace/punct-insensitive). SQL-equivalent:
    concat_ws(' ', tokens)."""
    return F.concat_ws(" ", tokenize_col(col, analyzer))


def exact_duplicates(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, n_docs, canonical_doc_id, doc_ids): groups with >1 doc.

    canonical = min doc_id (the survivor a dedup pass would keep).
    NOTE: doc_ids is a per-group array — a reporting convenience whose
    reducer state grows with the hottest group. For the scale path use
    deduplicate_corpus(), whose exact stage is an agg+join with bounded
    per-row state.
    """
    hashed = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingles(corpus: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text", analyzer: str = "simple") -> DataFrame:
    """(doc_id, shingle): distinct n-token shingles per doc (word n-grams)."""
    toks = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("terms"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("terms") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("terms") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("terms"), i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_signatures(doc_shingles: DataFrame, num_hashes: int = 8) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}): portable MinHash via seeded md5 hex minima."""
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(h)), F.col("shingle")))).alias(f"mh_{h}")
        for h in range(num_hashes)
    ]
    return doc_shingles.groupBy("doc_id").agg(*aggs)


def _capped_bucket_pairs(buckets: DataFrame, key_cols: list[str],
                         max_bucket: int | None,
                         splits: int = 1) -> DataFrame:
    """Self-join (doc_a < doc_b) within buckets, skipping buckets larger
    than max_bucket. The cap is what keeps LSH linear at web scale: one
    boilerplate bucket of 1M docs would otherwise emit ~5*10^11 pairs. A
    bucket that big is a near-certain duplicate GROUP — consume it via
    oversized_buckets() as a group instead of pairwise.

    The cap rides the shuffle the pair join needs anyway: a window
    count(*) over the bucket keys counts and filters in ONE exchange
    hash-partitioned on key_cols (reused by both join sides), instead of a
    second groupBy aggregation plus a semi-join back. A hot bucket lands in
    one window task, but counting it is linear — the quadratic pair
    explosion is what the filter then prevents.

    splits > 1 salts hot buckets under the cap: each member gets salt
    g = hash(doc_id) % splits, and the self-join runs block-wise on
    (bucket, block_a, block_b) — the left side replicates each row across
    block_b, the right side across block_a, so a member pair with salts
    (i, j) meets in exactly the two orientations (i, j) and (j, i), of
    which the doc_a < doc_b filter keeps exactly one. Result set is
    IDENTICAL for every splits value (pytest-pinned); per-task join state
    drops from |bucket| to |bucket|/splits rows per side, at the cost of
    replicating the bucket rows splits times through the exchange. Use for
    dense boilerplate/cluster cells that should be PAIRED under bounded
    task state rather than skipped by the cap."""
    if max_bucket is not None:
        from pyspark.sql import Window as _W

        w = _W.partitionBy(*key_cols)
        buckets = (
            buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    s = max(int(splits), 1)
    if s > 1:
        blocks = F.array(*[F.lit(i) for i in range(s)])
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(s)).cast("int")
        left = (
            buckets.withColumn("_blk_a", salt)
            .withColumn("_blk_b", F.explode(blocks))
            .alias("l")
        )
        right = (
            buckets.withColumn("_blk_b", salt)
            .withColumn("_blk_a", F.explode(blocks))
            .alias("r")
        )
        join_keys = [*key_cols, "_blk_a", "_blk_b"]
    else:
        left = buckets.alias("l")
        right = buckets.alias("r")
        join_keys = key_cols
    cond = (F.col("l.doc_id") < F.col("r.doc_id"))
    for c in join_keys:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    return left.join(right, cond)


def oversized_buckets(buckets: DataFrame, key_cols: list[str],
                      max_bucket: int) -> DataFrame:
    """(*key_cols, n_docs, doc_ids) for buckets the pairing step skipped —
    at web scale these are boilerplate/mirror groups to dedup wholesale
    (keep min doc_id, drop the rest) rather than pairwise.
    NOTE: doc_ids arrays grow with bucket size (> max_bucket by
    definition) — reporting convenience; deduplicate_corpus() consumes the
    same buckets via bounded agg+join instead."""
    return (
        buckets.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > max_bucket)
    )


def minhash_bands(signatures: DataFrame, num_bands: int = 4,
                  num_hashes: int = 8) -> DataFrame:
    """(doc_id, band, band_hash): LSH banding of minhash signatures;
    band hash = md5 of the band's concatenated minima."""
    rows = num_hashes // num_bands
    bands = None
    for b in range(num_bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        one = signatures.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
        )
        bands = one if bands is None else bands.unionByName(one)
    return bands


def minhash_candidate_pairs(
    signatures: DataFrame, num_bands: int = 4, num_hashes: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_bands): pairs sharing >=1 LSH band bucket (doc_a < doc_b).

    The self-join is per (band, band_hash) bucket, with buckets larger than
    max_bucket EXCLUDED from pairing (pair count stays O(docs * max_bucket)
    instead of quadratic in the hottest bucket; see _capped_bucket_pairs).
    Retrieve the skipped buckets as whole duplicate groups with
    minhash_oversized_groups().
    """
    bands = minhash_bands(signatures, num_bands, num_hashes)
    pairs = (
        _capped_bucket_pairs(bands, ["band", "band_hash"], max_bucket)
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def minhash_oversized_groups(
    signatures: DataFrame, num_bands: int = 4, num_hashes: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """(band, band_hash, n_docs, doc_ids): the buckets minhash_candidate_pairs
    skipped under the same max_bucket — near-certain duplicate groups."""
    bands = minhash_bands(signatures, num_bands, num_hashes)
    return oversized_buckets(bands, ["band", "band_hash"], max_bucket)


def jaccard_pairs(doc_shingles: DataFrame, candidates: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_common, n_a, n_b, jaccard) for candidate pairs only.

    Joining shingle sets only for LSH candidates keeps the verification step
    O(candidates x shingles), never all-pairs.
    """
    sizes = doc_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = doc_shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = doc_shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        candidates.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
        )
    )


def ngram_jaccard_join(
    corpus: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
) -> DataFrame:
    """EXACT n-gram-Jaccard similarity join: (doc_a, doc_b, n_common, n_a,
    n_b, jaccard) for every pair with jaccard >= threshold.

    Unlike the MinHash path this is exact (no probabilistic recall loss) —
    the scalable trick is candidate generation through the shingle inverted
    index (pairs must share >= 1 shingle) instead of a cross join, so cost
    is sum over shingles of df^2, not |docs|^2. max_shingle_df drops
    boilerplate shingles (df above the cap) from candidate GENERATION only
    — verification still counts them — the same hot-key bound as the LSH
    bucket cap; pairs sharing ONLY capped shingles are missed, which at a
    high threshold are boilerplate-dominated pairs the near-dup pass
    handles. Set max_shingle_df=None for fully exact (small corpora)."""
    sh = shingles(corpus, n=n, id_col=id_col, text_col=text_col, analyzer=analyzer)
    gen = sh
    if max_shingle_df is not None:
        dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        gen = sh.join(
            dfs.where(F.col("_df") <= max_shingle_df).select("shingle"), "shingle"
        )
    cand = (
        gen.alias("l")
        .join(gen.alias("r"), "shingle")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return jaccard_pairs(sh, cand).where(F.col("jaccard") >= threshold)


def simhash_fingerprints(corpus: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", analyzer: str = "simple") -> DataFrame:
    """(doc_id, simhash): tf-weighted 64-bit SimHash — pure JVM column
    algebra (the r1 per-row-per-term Python md5 loop is gone).

    Dataflow: explode terms -> (doc, term, tf) hash-agg (map-side combine)
    -> per-term md5 split into two 32-bit halves -> 64 conditional sums per
    doc -> two's-complement recombination into a signed int64. Each term is
    md5-hashed once per (doc, term) row JVM-side; everything stays in
    whole-stage codegen, and the DuckDB oracle replicates it exactly.
    """
    toks = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("terms"),
    )
    tf = (
        toks.select("doc_id", F.explode("terms").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    hx = F.md5(F.col("term"))
    hashed = tf.select(
        "doc_id",
        "tf",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("lo"),
    )

    def bit(i: int):
        half = F.col("lo") if i < 32 else F.col("hi")
        return F.shiftright(half, i % 32).bitwiseAND(F.lit(1))

    accs = [
        F.sum(F.when(bit(i) == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"acc_{i}")
        for i in range(64)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*accs)
    # two's complement: bit 63 contributes -2^63 when set
    fp = None
    for i in range(64):
        weight = F.lit(-9223372036854775808) if i == 63 else F.lit(1 << i)
        term_c = F.when(F.col(f"acc_{i}") > 0, weight).otherwise(F.lit(0))
        fp = term_c if fp is None else fp + term_c
    sig = per_doc.select("doc_id", fp.cast("long").alias("simhash"))
    # docs with zero tokens have no tf rows: fingerprint 0 (r1 semantics)
    ids = corpus.select(F.col(id_col).cast("string").alias("doc_id"))
    return ids.join(sig, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0)).cast("long").alias("simhash")
    )


def simhash_chunks(fingerprints: DataFrame) -> DataFrame:
    """(doc_id, simhash, chunk, chunk_val): 4 x 16-bit banding of the 64-bit
    fingerprint (pigeonhole: hamming <= 3 pairs agree on >= 1 chunk)."""
    chunks = None
    for i in range(4):
        c = fingerprints.select(
            "doc_id",
            "simhash",
            F.lit(i).alias("chunk"),
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
        )
        chunks = c if chunks is None else chunks.unionByName(c)
    return chunks


def simhash_near_duplicates(
    fingerprints: DataFrame, max_hamming: int = 3,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within max_hamming bits.

    Candidates come from 4 chunk-bucket joins, then the exact popcount
    filter. Buckets larger than max_bucket are EXCLUDED from pairing (a
    popular 16-bit chunk value at web scale holds millions of docs — the
    unbounded self-join is quadratic in that bucket); retrieve them as
    whole groups with simhash_oversized_groups().
    """
    chunks = simhash_chunks(fingerprints)
    cand = (
        _capped_bucket_pairs(chunks, ["chunk", "chunk_val"], max_bucket)
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def simhash_oversized_groups(
    fingerprints: DataFrame, max_bucket: int = 1000
) -> DataFrame:
    """(chunk, chunk_val, n_docs, doc_ids): chunk buckets the pairing step
    skipped under the same max_bucket."""
    return oversized_buckets(
        simhash_chunks(fingerprints), ["chunk", "chunk_val"], max_bucket
    )


def cosine_neardup_bucketed(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_centroids: int = 16,
    probes: int = 2,
    seed: int = 42,
    centroids=None,
    max_bucket: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
    bucket_splits: int = 1,
) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-duplicate pairs with cos >=
    threshold, via IVF-bucket candidate generation — the 100 TB path for
    embedding-cosine dedup (the all-pairs zip_with join is exact but
    quadratic; fine only at audit scale).

    Each vector is assigned to its `probes` nearest cells (multi-probe:
    near-identical vectors that straddle a cell boundary still meet in the
    runner-up cell); candidates are pairs sharing >= 1 cell, then an EXACT
    JVM zip_with cosine verifies — so precision is exact and only recall
    depends on the bucketing, rising with `probes` like nprobe in ivf_topk.
    max_bucket (default 1000, same as the LSH/simhash caps) bounds
    degenerate cells: candidate generation is per-cell (Σ cell² under the
    cap), verification touches candidates only; nothing is all-pairs.
    max_bucket=None removes the bound — audit-scale only.

    bucket_splits > 1 salts hot cells (the dedup-side twin of
    ivf_topk_df's bucket_splits): the per-cell self-join runs block-wise
    so dense boilerplate/embedding clusters are PAIRED under per-task
    state of |cell|/splits instead of being skipped by the cap — raise
    max_bucket (or set it None) together with splits to consume such
    cells pairwise. Pair results are identical at any splits value
    (see _capped_bucket_pairs).
    """
    import numpy as np
    import pandas as pd

    from openmatch_spark.query.dense import _centroids, _normalize_rows, _probe_order

    C = (
        _normalize_rows(np.asarray(centroids, dtype=np.float64))
        if centroids is not None
        else _centroids(dim, n_centroids, seed)
    )
    p = min(int(probes), C.shape[0])

    def probe_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            order = _probe_order(M, C, p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str).to_numpy().repeat(p),
                    "bucket": order.reshape(-1).astype("int32"),
                }
            )

    probed = embeddings.select(id_col, vec_col).mapInPandas(
        probe_fn, "doc_id string, bucket int"
    )
    cand = (
        _capped_bucket_pairs(probed, ["bucket"], max_bucket, splits=bucket_splits)
        .select(F.col("l.doc_id").alias("vec_a"), F.col("r.doc_id").alias("vec_b"))
        .distinct()
    )
    e = embeddings.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    a = e.select(F.col("_id").alias("vec_a"), F.col("_v").alias("_va"))
    b = e.select(F.col("_id").alias("vec_b"), F.col("_v").alias("_vb"))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(
        F.zip_with("_va", "_va", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    ))
    nb = F.sqrt(F.aggregate(
        F.zip_with("_vb", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    ))
    out = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", (dot / (na * nb)).alias("cos"))
        .where(F.col("cos") >= F.lit(float(threshold)))
    )
    if round_to is not None:
        out = out.withColumn("cos", F.round("cos", round_to))
    return out.select("vec_a", "vec_b", "cos")


def connected_components_min_label(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, component) for every vertex in `edges`: component = the
    smallest doc_id reachable over the undirected edge set — union-find
    canonical-group semantics, computed as distributed min-label propagation
    with pointer jumping (label(x) also adopts label(label(x)) each round,
    so convergence is O(log longest-chain) rounds, not O(chain)).

    Each round is one edge join + min-agg + one label self-join; the frame
    is localCheckpoint-ed per round because iterative lineage otherwise
    grows exponentially (the standard Spark iterative-algorithm idiom —
    GraphFrames' CC does the same). At 100 TB the cost is rounds x one
    shuffle of the EDGE set (near-dup graphs: |edges| << |corpus|), never a
    shuffle of the corpus itself.
    """
    und = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .union(edges.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )
    def _changed(new, old) -> int:
        return (
            new.join(old.withColumnRenamed("label", "_old"), "doc_id")
            .where(F.col("label") != F.col("_old"))
            .count()
        )

    converged = False
    for it in range(max_iters):
        msgs = und.join(labels.withColumnRenamed("doc_id", "a"), "a").select(
            F.col("b").alias("doc_id"), "label"
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump (path halving): x's label also adopts its label's label
        hop = new.select(
            F.col("doc_id").alias("label"), F.col("label").alias("_label2")
        )
        new = (
            new.join(hop, "label", "left")
            .select(
                "doc_id", F.coalesce("_label2", F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        # convergence check every OTHER round (plus the final round): the
        # check is its own Spark job, and with pointer jumping most graphs
        # settle in a handful of rounds — probing every round would spend
        # as many jobs on checking as on propagating. An extra idempotent
        # round costs the same as the check it replaces.
        if it % 2 == 1 or it == max_iters - 1:
            if _changed(new, labels) == 0:
                labels = new
                converged = True
                break
        labels = new
    if not converged:
        # the loop exited by exhaustion; unconverged labels would break the
        # closure-mode invariant that every dup_of names a component ROOT —
        # surface it instead of silently returning partial propagation
        import warnings

        warnings.warn(
            f"connected_components_min_label: not converged after "
            f"{max_iters} rounds (chain length > 2^{max_iters}); labels may "
            f"not be component minima",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.withColumnRenamed("label", "component")


def deduplicate_corpus(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
    closure: bool = False,
    url_col: str | None = None,
) -> DataFrame:
    """One-call corpus dedup: (doc_id, keep, reason, dup_of).

    Composition of the primitives above, all shuffle-bounded:
      0. (url_col set) canonical-url groups — docs whose url canonicalizes
         identically (http/https, default ports, #fragments, tracking
         params; operators/transforms.py canonical_url_col) keep the min
         doc_id, reason 'url'. Catches recrawl variants whose extracted
         text differs (banner rotation) before any content comparison;
         NULL/empty canonical urls never group.
      1. exact groups (md5 of normalized text) — keep the min doc_id;
      2. MinHash-LSH candidates among exact survivors, Jaccard-verified at
         >= jaccard_threshold — drop any doc with a verified near-dup of
         smaller id (greedy local-min rule: no iterative connected
         components, one pass, every dropped doc names a kept-or-chained
         neighbor in dup_of);
      3. oversized LSH buckets (boilerplate groups the pair join skipped
         under max_bucket) — keep each bucket's min doc_id wholesale.

    reason: 'url' | 'exact' | 'near' | 'bucket' for drops, null for keeps.
    At 100 TB every stage is a bounded hash join/agg; nothing is quadratic.

    closure=True switches from the greedy local-min rule to union-find
    canonical groups (connected_components_min_label over the union of
    exact/verified-near/bucket edges): every dup_of then names a KEPT doc
    (the component minimum), chains A~B~C resolve to one root, and a doc
    with no direct smaller neighbor but a smaller component minimum is
    dropped too (reason 'near' when no direct-edge reason applies). Costs
    O(log chain) extra edge-set shuffles; default stays the one-pass rule.
    """
    ids = corpus.select(F.col(id_col).cast("string").alias("doc_id"))

    drop_url = None
    if url_col is not None:
        from openmatch_spark.operators.transforms import url_dedup_key_col

        urls = corpus.select(
            F.col(id_col).cast("string").alias("doc_id"),
            url_dedup_key_col(F.col(url_col)).alias("_cu"),
        ).where(F.col("_cu").isNotNull() & (F.length("_cu") > 0))
        umin = urls.groupBy("_cu").agg(
            F.min("doc_id").alias("dup_of"), F.count(F.lit(1)).alias("_n")
        )
        drop_url = (
            urls.join(umin.where(F.col("_n") > 1), "_cu")
            .where(F.col("doc_id") != F.col("dup_of"))
            .select("doc_id", "dup_of")
            .withColumn("reason", F.lit("url"))
        )

    # exact stage via agg+join, NOT exact_duplicates' collect_list arrays:
    # a hot content hash (1M identical boilerplate docs) must never
    # materialize a 1M-element array in one reducer row
    hashed = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(normalized_text(F.col(text_col), analyzer)).alias("_h"),
    )
    if drop_url is not None:
        # url drops leave the pipeline before content comparison, exactly
        # like exact drops leave before the near stage
        hashed = hashed.join(drop_url.select("doc_id"), "doc_id", "left_anti")
    gmin = hashed.groupBy("_h").agg(
        F.min("doc_id").alias("dup_of"), F.count(F.lit(1)).alias("_n")
    )
    drop_exact = (
        hashed.join(gmin.where(F.col("_n") > 1), "_h")
        .where(F.col("doc_id") != F.col("dup_of"))
        .select("doc_id", "dup_of")
        .withColumn("reason", F.lit("exact"))
    )

    survivors = ids.join(drop_exact.select("doc_id"), "doc_id", "left_anti")
    if drop_url is not None:
        survivors = survivors.join(drop_url.select("doc_id"), "doc_id", "left_anti")
    surv_corpus = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    ).join(survivors, "doc_id", "left_semi")

    sh = shingles(surv_corpus, n=shingle_n, analyzer=analyzer)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = minhash_candidate_pairs(sig, num_bands=num_bands,
                                   num_hashes=num_hashes, max_bucket=max_bucket)
    verified = jaccard_pairs(sh, cand).where(F.col("jaccard") >= jaccard_threshold)
    # local-min rule: a doc is dropped iff some verified near-dup has a
    # smaller id; dup_of = its smallest such neighbor
    drop_near = (
        verified.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr"))
        .groupBy("doc_id")
        .agg(F.min("nbr").alias("dup_of"))
        .withColumn("reason", F.lit("near"))
    )

    # bucket stage likewise as agg+join (an oversized bucket is by
    # definition > max_bucket rows — no arrays)
    bands = minhash_bands(sig, num_bands=num_bands, num_hashes=num_hashes)
    bstats = bands.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("_n"), F.min("doc_id").alias("_canon")
    )
    bucket_pairs = (
        bands.join(bstats.where(F.col("_n") > max_bucket), ["band", "band_hash"])
        .where(F.col("doc_id") != F.col("_canon"))
        .select("doc_id", "_canon")
    )
    drop_bucket = (
        bucket_pairs.groupBy("doc_id")
        .agg(F.min("_canon").alias("dup_of"))
        .withColumn("reason", F.lit("bucket"))
    )

    drops = drop_exact.unionByName(drop_near).unionByName(drop_bucket)
    if drop_url is not None:
        drops = drops.unionByName(drop_url)
    # precedence url > exact > near > bucket for docs flagged by several
    # stages (url and exact can't actually co-flag — url drops leave the
    # hash stage — but the window keeps the rule total)
    order = (
        F.when(F.col("reason") == "url", 0)
        .when(F.col("reason") == "exact", 1)
        .when(F.col("reason") == "near", 2)
        .otherwise(3)
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("doc_id").orderBy(order.asc(), F.col("dup_of").asc())
    drops = (
        drops.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if closure:
        # union-find canonical groups: the duplicate GRAPH is the union of
        # exact member->canon edges, verified near-dup pairs, and oversized-
        # bucket member->canon edges; component = min reachable id. dup_of
        # always names the kept component root; reason keeps the direct-edge
        # reason where one exists ('near' for purely transitive drops).
        edges = (
            drop_exact.select(F.col("doc_id").alias("doc_a"), F.col("dup_of").alias("doc_b"))
            .unionByName(verified.select("doc_a", "doc_b"))
            .unionByName(
                bucket_pairs.select(
                    F.col("doc_id").alias("doc_a"), F.col("_canon").alias("doc_b")
                )
            )
        )
        if drop_url is not None:
            edges = edges.unionByName(
                drop_url.select(F.col("doc_id").alias("doc_a"), F.col("dup_of").alias("doc_b"))
            )
        comp = connected_components_min_label(edges)
        return (
            ids.join(comp, "doc_id", "left")
            .join(drops.select("doc_id", "reason"), "doc_id", "left")
            .select(
                "doc_id",
                (F.col("component").isNull() | (F.col("component") == F.col("doc_id"))).alias("keep"),
                F.when(
                    F.col("component").isNotNull() & (F.col("component") != F.col("doc_id")),
                    F.coalesce("reason", F.lit("near")),
                ).alias("reason"),
                F.when(
                    F.col("component").isNotNull() & (F.col("component") != F.col("doc_id")),
                    F.col("component"),
                ).alias("dup_of"),
            )
        )
    return ids.join(drops, "doc_id", "left").select(
        "doc_id",
        F.col("reason").isNull().alias("keep"),
        "reason",
        "dup_of",
    )
