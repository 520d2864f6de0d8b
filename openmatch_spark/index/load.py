"""Index loading: lazy DataFrames over the on-disk layout + frozen stats."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.index.layout import IndexPaths
from openmatch_spark.index.storage import IndexStorage
from openmatch_spark.functions.localrel import in_list

# vocabularies below this row count are collected driver-side once per
# BM25Index, making repeated searches (the p50/p99 regime) zero-job for
# term lookup; larger dictionaries fall back to the isin-pruned scan.
# 500k terms via the Arrow path is ~tens of MB of Python dict — far below
# the Row-object footprint that could OOM a default 1g driver.
_DRIVER_DICT_MAX_TERMS = 500_000

# distinct sentinel for "dictionary too big to cache" (an EMPTY vocabulary
# must still memoize as {} rather than re-running the count per call)
_TOO_BIG = False


@dataclass
class BM25Index:
    spark: SparkSession
    paths: IndexPaths
    stats: dict
    store: IndexStorage | None = None
    _term_cache: dict | bool | None = field(default=None, repr=False)
    _shard_cache: list | None = field(default=None, repr=False)
    _delete_cache: dict | None = field(default=None, repr=False)
    _df_cache: dict = field(default_factory=dict, repr=False)
    _vocab_cache: tuple | bool | None = field(default=None, repr=False)
    _shard_docs_cache: dict | None = field(default=None, repr=False)
    _exists_cache: dict = field(default_factory=dict, repr=False)

    def _store(self) -> IndexStorage:
        if self.store is None:
            self.store = IndexStorage(spark=self.spark, paths=self.paths)
        return self.store

    def _read_cached(self, kind: str) -> DataFrame:
        """store.read(kind) memoized per handle: a loaded index is a
        read-only SNAPSHOT (committed_shards docstring), so its table
        DataFrames — whose construction pays file listing + schema read,
        ~60 ms each on the py4j path — are stable for the handle's
        lifetime. Hot query surfaces touch postings/docmap/dictionary
        several times per call; without the memo each touch re-lists.
        refresh() drops the memo along with the segment snapshot."""
        df = self._df_cache.get(kind)
        if df is None:
            df = self._store().read(kind)
            self._df_cache[kind] = df
        return df

    @property
    def dictionary(self) -> DataFrame:
        return self._read_cached("dictionary")

    def _ensure_driver_vocab(self) -> None:
        """Populate the driver-side vocabulary memos (or mark them too big).

        One Arrow collect fills BOTH the {term -> bucket} lookup dict and
        the sorted (terms, df, bucket) arrays that vocab_arrays() serves to
        the driver-side expansion fast path — df rides along because the
        expansion cap's deterministic order is (edits ASC, df DESC, term
        ASC) and a second collect for it would re-pay the job."""
        if self._term_cache is not None:
            return
        n = self.dictionary.count()
        if n > _DRIVER_DICT_MAX_TERMS:
            self._term_cache = _TOO_BIG
            self._vocab_cache = _TOO_BIG
            return
        # Arrow transfer + plain-python dict: no JVM Row objects, no
        # per-row Python wrappers — ~40 bytes/entry either heap
        pdf = self.dictionary.select("term", "term_bucket", "df").toPandas()
        self._term_cache = dict(
            zip(pdf["term"].tolist(), pdf["term_bucket"].tolist())
        )
        import numpy as np

        # sorted driver-side (numpy argsort), NOT via orderBy: an orderBy
        # before the collect would add a range exchange to the one-time
        # vocabulary job for a sort the driver does in milliseconds
        terms = np.asarray(pdf["term"].tolist(), dtype=object)
        order = np.argsort(terms, kind="stable")
        self._vocab_cache = (
            terms[order],
            pdf["df"].to_numpy(dtype="int64")[order],
            pdf["term_bucket"].to_numpy(dtype="int64")[order],
        )

    def vocab_arrays(self):
        """(terms, df, bucket) numpy arrays, term-sorted, for vocabularies
        in the driver-cache regime (see term_buckets) — None when the
        dictionary is too big, in which case expansion surfaces use the
        distributed dictionary scan (the cluster-scale path)."""
        self._ensure_driver_vocab()
        return None if self._vocab_cache is _TOO_BIG else self._vocab_cache

    def term_buckets(self, terms: list[str]) -> dict[str, int]:
        """{term -> term_bucket} for the given in-vocabulary terms.

        Small dictionaries (< 2M terms) are collected once and memoized —
        a single-query search then runs no Spark job for term lookup, which
        dominated p50 latency. Huge dictionaries use a term-pruned scan
        (PushedFilters: In(term, ...)), which is also the cluster-scale path.
        """
        self._ensure_driver_vocab()
        if self._term_cache is not _TOO_BIG:
            return {t: self._term_cache[t] for t in terms if t in self._term_cache}
        import pyspark.sql.functions as F

        matched = (
            self.dictionary.where(in_list("term", terms))
            .select("term", "term_bucket")
            .collect()
        )
        return {r["term"]: r["term_bucket"] for r in matched}

    def committed_shards(self) -> list[int]:
        """Shards present in the manifest — the index's source of truth.

        Memoized once per BM25Index (one tiny manifest read): a loaded index
        is a consistent SNAPSHOT of the segment set at load time, like an
        Iceberg table scan pinned to a snapshot id. A handle held across a
        compaction keeps filtering on the retired shard list (whose data
        dirs may be gone — searches go empty, they don't go wrong), and one
        held across an ingest doesn't see the new segments; call refresh()
        (or load_index again) to move the snapshot forward."""
        if self._shard_cache is None:
            self._shard_cache = sorted(self._manifest_counts())
        return self._shard_cache

    def _manifest_counts(self) -> dict:
        """{shard -> n_docs} manifest snapshot — ONE collect feeds both
        the committed-shard set and the kernel's bucket sizing."""
        if self._shard_docs_cache is None:
            rows = self.manifest.select("shard", "n_docs").collect()
            self._shard_docs_cache = {
                int(r["shard"]): int(r["n_docs"]) for r in rows
            }
        return self._shard_docs_cache

    def refresh(self) -> "BM25Index":
        """Drop memoized state (segment snapshot, driver dictionary cache)
        so the next read reflects segments committed or vocabulary appended
        since load — cheaper than re-calling load_index, same effect."""
        self._shard_cache = None
        self._term_cache = None
        self._delete_cache = None
        self._df_cache = {}
        self._vocab_cache = None
        self._shard_docs_cache = None
        self._exists_cache = {}
        return self

    # ---- document deletes (tombstones) ----------------------------------

    def has_deletes(self) -> bool:
        """True if the tombstone table exists (index/deletes.py wrote it)."""
        return self._exists_cached("deletes")

    @property
    def deletes(self) -> DataFrame:
        """Live tombstones: (shard, doc_ord, doc_id, deleted_at), restricted
        to committed shards — rows referencing retired segments (left by a
        compaction that crashed before its purge) are pruned the same way
        stray data dirs are."""
        import pyspark.sql.functions as F

        return self._read_cached("deletes").where(
            F.col("shard").isin(self.committed_shards())
        )

    def deleted_ords(self) -> dict:
        """{shard -> sorted int64 numpy array of tombstoned doc_ords},
        memoized per handle. This is the searcher's live-docs mask, held
        driver-side and shipped to kernels in task closures — the exact
        design of Lucene's liveDocs bitsets, which every searcher keeps in
        memory per segment. The set is bounded by deletes SINCE the last
        compaction (compaction purges it), not by index size; at 10^12 docs
        the maintenance cycle keeps it small the same way Lucene merges do."""
        if self._delete_cache is None:
            import numpy as np

            if not self.has_deletes():
                self._delete_cache = {}
            else:
                pdf = self.deletes.select("shard", "doc_ord").toPandas()
                self._delete_cache = {
                    int(shard): np.sort(g["doc_ord"].to_numpy(dtype="int64"))
                    for shard, g in pdf.groupby("shard")
                }
        return self._delete_cache

    def mask_deleted(self, candidates: DataFrame) -> DataFrame:
        """Drop tombstoned (shard, doc_ord) rows from a candidate frame —
        the join-path twin of the kernel-side liveDocs mask, applied BEFORE
        any rank/top-k cut so a deleted doc never consumes a result slot.
        The tombstone side is tiny (bounded by deletes since last
        compaction) and broadcast."""
        import pyspark.sql.functions as F

        if not self.deleted_ords():
            return candidates
        return candidates.join(
            F.broadcast(self.deletes.select("shard", "doc_ord").distinct()),
            ["shard", "doc_ord"],
            "left_anti",
        )

    @property
    def docmap(self) -> DataFrame:
        return self._gated("docmap")

    @property
    def stored_attrs(self) -> tuple:
        """Doc-values columns frozen at build time (build_index
        store_attrs) — () when the index stores none."""
        return tuple(self.stats.get("store_attrs") or ())

    def stored_attributes(self, *attrs: str) -> DataFrame:
        """(doc_id, <attrs...>) hydration table from the index's OWN
        docmap — Lucene doc values: a column-pruned, manifest-gated scan
        that replaces the raw-corpus join wherever a query surface needs
        per-doc attributes (facets, hit_stats, decay_rescore, ...).
        Defaults to every stored column."""
        import pyspark.sql.functions as F

        want = list(attrs) if attrs else list(self.stored_attrs)
        missing = [a for a in want if a not in self.stored_attrs]
        if missing:
            raise ValueError(
                f"attributes {missing} are not stored in this index "
                f"(stored: {list(self.stored_attrs)}) — rebuild with "
                f"build_index(store_attrs=...)"
            )
        return self.docmap.select(F.col("doc_id"), *[F.col(a) for a in want])

    @property
    def postings(self) -> DataFrame:
        return self._gated("postings")

    def _exists_cached(self, kind: str) -> bool:
        """store.exists(kind) memoized per handle — the same snapshot
        semantics as _read_cached: whether an optional table (positions
        sidecar, tombstones) is present is fixed for the handle's
        lifetime, and the probe costs a py4j schema read (~0.4 s) that
        hot query surfaces would otherwise re-pay per call. refresh()
        drops it (e.g. after build_positions / delete_docs)."""
        v = self._exists_cache.get(kind)
        if v is None:
            v = self._store().exists(kind)
            self._exists_cache[kind] = v
        return v

    def has_positions(self) -> bool:
        """True if the positional sidecar exists (build_positions ran)."""
        return self._exists_cached("positions")

    @property
    def positions(self) -> DataFrame:
        """Positional sidecar (phrase/proximity queries); manifest-gated
        like postings. Raises if build_positions has not been run."""
        if not self.has_positions():
            raise FileNotFoundError(
                "no positions sidecar at this index — run build_positions() "
                "(and re-run it after compact_index, which invalidates it)"
            )
        return self._gated("positions")

    def _gated(self, kind: str) -> DataFrame:
        """Manifest-gated read: only committed shards are visible.

        This is the read half of the write-then-manifest protocol: a crashed
        build (shard data written, manifest row not yet appended) or a
        crashed compaction (merged shard written, old dirs not yet retired /
        new shard not yet referenced) leaves stray `shard=` partition dirs,
        and the In-filter on the partition column prunes them out — queries
        never see an uncommitted or superseded segment. The filter is a
        static partition prune (no extra shuffle, no extra job)."""
        df = self._read_cached(kind)
        import pyspark.sql.functions as F

        return df.where(F.col("shard").isin(self.committed_shards()))

    @property
    def manifest(self) -> DataFrame:
        return self._read_cached("manifest")

    @property
    def metrics(self) -> DataFrame:
        """Per-batch build metrics (phase walls, row counts, commit times) —
        the north-rule metrics table companion to the manifest lineage."""
        return self._store().read("metrics")


def load_index(
    spark: SparkSession,
    index_dir: str,
    table_prefix: str | None = None,
    table_format: str | None = None,
) -> BM25Index:
    """Open an index built at index_dir. Pass the same table_prefix (or
    configure spark.sql.catalog.local) the build used to read catalog-table
    indexes; parquet paths otherwise (index/storage.py)."""
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    return BM25Index(
        spark=spark, paths=store.paths, stats=store.read_stats(), store=store
    )
