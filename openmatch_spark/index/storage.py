"""Pluggable index-table storage: catalog tables or parquet paths.

SURVEY §7.4 contract (promised by index/layout.py): every index table —
dictionary / docmap / postings / manifest / metrics — goes through this
indirection so
the SAME build and query code targets

- an Iceberg (or any V2) catalog when one is configured
  (``spark.sql.catalog.<name>`` set, e.g. ``spark.sql.catalog.local`` →
  ``org.apache.iceberg.spark.SparkCatalog``): writes use the V2
  ``df.writeTo(table)`` API (createOrReplace / overwritePartitions /
  append), reads use ``spark.read.table``;
- the built-in session catalog (warehouse-managed parquet tables, V1):
  writes use ``saveAsTable`` / ``insertInto`` (dynamic partition overwrite
  comes from the session conf build_index already scopes), reads use
  ``spark.read.table``;
- plain parquet paths otherwise (the sandbox default): byte-identical to
  the r1 layout.

stats.json stays a filesystem artifact in every mode (it is the atomic
build-commit marker — tmp+rename semantics need a filesystem, and Iceberg
deployments keep it next to the warehouse or in the catalog's table
properties).

Table names are ``<prefix>_<kind>``, e.g. ``local.db.cc_index_postings``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.index.layout import IndexPaths

KINDS = (
    "dictionary", "docmap", "postings", "positions",
    "manifest", "metrics", "deletes",
)


def _is_v2_catalog(spark: SparkSession, catalog: str) -> bool:
    """A catalog is V2 iff an implementation class is configured for it;
    the implicit session catalog (spark_catalog) stays on the V1 writers."""
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:
        return False


def _sanitize(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name).strip("_") or "index"


@dataclass
class IndexStorage:
    """One index's table set, resolved to a backend at construction.

    table_prefix=None → parquet-path mode rooted at index_dir (r1 layout).
    table_prefix="cat.ns.name" → catalog-table mode; V2 writeTo when `cat`
    has a configured implementation, V1 saveAsTable otherwise.
    """

    spark: SparkSession
    paths: IndexPaths
    table_prefix: str | None = None
    table_format: str = "parquet"  # "iceberg" for an Iceberg catalog

    # ---- resolution --------------------------------------------------------

    @classmethod
    def resolve(
        cls,
        spark: SparkSession,
        index_dir: str,
        table_prefix: str | None = None,
        table_format: str | None = None,
    ) -> "IndexStorage":
        """Pick the backend: explicit table_prefix wins; else, if
        ``spark.sql.catalog.local`` is configured (SURVEY §7.4's trigger),
        tables go to ``local.db.<index_dir basename>`` as Iceberg; else
        parquet paths under index_dir."""
        fmt = table_format
        if table_prefix is None and _is_v2_catalog(spark, "local"):
            import os

            table_prefix = f"local.db.{_sanitize(os.path.basename(index_dir.rstrip('/')))}"
            fmt = fmt or "iceberg"
        return cls(
            spark=spark,
            paths=IndexPaths(index_dir),
            table_prefix=table_prefix,
            table_format=fmt or "parquet",
        )

    @property
    def is_table_mode(self) -> bool:
        return self.table_prefix is not None

    @property
    def _v2(self) -> bool:
        if not self.is_table_mode:
            return False
        catalog = self.table_prefix.split(".")[0]
        return _is_v2_catalog(self.spark, catalog)

    def table_name(self, kind: str) -> str:
        return f"{self.table_prefix}_{kind}"

    def location(self, kind: str) -> str:
        """Human-readable location (path or table name) for logs/tests."""
        return self.table_name(kind) if self.is_table_mode else getattr(self.paths, kind)

    # ---- reads -------------------------------------------------------------

    def _recover_swap(self, kind: str) -> None:
        """Complete (or roll back) an aside-swap interrupted by a crash.

        overwrite(stage=True) in path mode commits via write-to-scratch →
        rename(live, _old_<kind>) → rename(scratch, live) → rmtree(_old_).
        The only window where no live dir exists is between the two renames;
        by then the scratch write has fully committed, so recovery FORWARD
        (scratch → live) is always correct. A stray _old_<kind> with the
        live dir present is post-commit litter and is removed. If somehow
        only _old_ survives, restore it (old data beats no data).

        NOTE: the whole swap protocol assumes a POSIX-rename filesystem
        visible to the driver (same assumption stats.json makes) — on an
        object store front it with a rename-capable layer or use table mode.
        """
        if self.is_table_mode:
            return
        import os
        import shutil

        target = getattr(self.paths, kind)
        scratch = os.path.join(self.paths.root, f"_stage_{kind}")
        aside = os.path.join(self.paths.root, f"_old_{kind}")
        if os.path.exists(target):
            return
        if os.path.exists(scratch) and os.path.exists(aside):
            os.rename(scratch, target)  # finish the interrupted commit
            shutil.rmtree(aside, ignore_errors=True)
        elif os.path.exists(aside):
            os.rename(aside, target)  # conservative rollback

    def read(self, kind: str) -> DataFrame:
        if self.is_table_mode:
            return self.spark.read.table(self.table_name(kind))
        self._recover_swap(kind)
        return self.spark.read.parquet(getattr(self.paths, kind))

    def exists(self, kind: str) -> bool:
        """False ONLY when the table/path genuinely is not there. Any other
        read error propagates: callers branch on exists() for protocol
        decisions (e.g. incremental shard allocation falls back to
        stats.num_shards when the manifest is absent), and swallowing a
        transient failure would silently pick the wrong branch."""
        if self.is_table_mode:
            return self.spark.catalog.tableExists(self.table_name(kind))
        self._recover_swap(kind)
        import os

        target = getattr(self.paths, kind)
        # fast path: path mode already assumes a driver-visible POSIX
        # filesystem (see _recover_swap) — when the directory is plainly
        # absent, skip the py4j schema probe and its JVM-exception round
        # trip. When it IS present, still probe: an existing-but-empty
        # directory must keep reading as False (UNABLE_TO_INFER_SCHEMA).
        if not os.path.exists(target):
            return False
        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            self.spark.read.parquet(target).schema
            return True
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
                return False
            raise

    # ---- writes ------------------------------------------------------------

    def overwrite(
        self,
        df: DataFrame,
        kind: str,
        partition_by: list[str] | None = None,
        stage: bool = False,
    ) -> None:
        """Full-table (static) or per-partition (dynamic, via the session's
        partitionOverwriteMode conf — build_index scopes it) overwrite.

        V2 catalogs dispatch on the same conf: dynamic → overwritePartitions
        (replaces only the partitions present in df, Iceberg's dynamic
        overwrite), static → createOrReplace.

        stage=True: pass when df READS the same table it overwrites (segment
        compaction derives the merged shard from the existing docmap/
        postings). V1 session-catalog insertInto rejects self-read-write
        plans outright, so the staged path materializes df to a scratch
        parquet dir next to stats.json (shared storage in every deployment,
        same assumption stats.json itself makes) and re-reads it. Iceberg
        needs no staging (snapshot isolation). Path mode: partitioned
        dynamic overwrites stage internally; a NON-partitioned self-read
        overwrite (the rebaseline dictionary rewrite) would trip Spark's
        cannot-overwrite-path-being-read check, so it writes to scratch and
        atomically swaps the directory (one write, one rename — no
        read-back).
        """
        dynamic = (
            self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            .lower()
            == "dynamic"
        )
        if stage and not self.is_table_mode and not partition_by:
            import os
            import shutil

            # aside-swap, not delete-then-rename: the only unprotected
            # window is between the two renames (microseconds, no data
            # movement), and a crash inside it leaves the old table intact
            # under `_old_<kind>` for manual recovery — a plain rmtree of
            # the live dir before the rename would instead leave NO table
            # at all if the process died mid-swap (seconds for a big dir).
            target = getattr(self.paths, kind)
            scratch = os.path.join(self.paths.root, f"_stage_{kind}")
            aside = os.path.join(self.paths.root, f"_old_{kind}")
            shutil.rmtree(scratch, ignore_errors=True)
            shutil.rmtree(aside, ignore_errors=True)
            df.write.mode("overwrite").parquet(scratch)
            if os.path.exists(target):
                os.rename(target, aside)
            os.rename(scratch, target)
            shutil.rmtree(aside, ignore_errors=True)
            return
        if stage and self.is_table_mode and not self._v2:
            import os
            import shutil

            scratch = os.path.join(self.paths.root, f"_stage_{kind}")
            try:
                df.write.mode("overwrite").parquet(scratch)
                self.overwrite(
                    self.spark.read.parquet(scratch), kind, partition_by
                )
            finally:
                shutil.rmtree(scratch, ignore_errors=True)
            return
        if not self.is_table_mode:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(getattr(self.paths, kind))
            return
        name = self.table_name(kind)
        if self._v2:
            w = df.writeTo(name).using(self.table_format)
            if dynamic and self.spark.catalog.tableExists(name):
                w.overwritePartitions()
            else:
                if partition_by:
                    from pyspark.sql.functions import col

                    w = w.partitionedBy(*[col(c) for c in partition_by])
                w.createOrReplace()
            return
        # V1 session catalog
        if dynamic and self.spark.catalog.tableExists(name):
            # insertInto honors spark.sql.sources.partitionOverwriteMode but
            # matches columns BY POSITION — align to the table's layout
            # (partition columns are stored last)
            cols = self.spark.read.table(name).columns
            df.select(*cols).write.mode("overwrite").insertInto(name)
        else:
            w = df.write.mode("overwrite").format(self.table_format)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.saveAsTable(name)

    def append(self, df: DataFrame, kind: str) -> None:
        if not self.is_table_mode:
            df.write.mode("append").parquet(getattr(self.paths, kind))
            return
        name = self.table_name(kind)
        if self._v2:
            if self.spark.catalog.tableExists(name):
                df.writeTo(name).append()
            else:
                df.writeTo(name).using(self.table_format).create()
        else:
            df.write.mode("append").format(self.table_format).saveAsTable(name)

    def delete_partitions(self, kind: str, col: str, values: list) -> None:
        """Drop whole partitions (used by segment compaction to retire
        merged shards). Path mode removes `col=v` dirs; V2 catalogs issue a
        transactional DELETE; V1 session-catalog tables drop metastore
        partitions (partial spec — removes every sub-partition under it)."""
        if not self.is_table_mode:
            import os
            import shutil

            base = getattr(self.paths, kind)
            for v in values:
                shutil.rmtree(os.path.join(base, f"{col}={v}"), ignore_errors=True)
            return
        name = self.table_name(kind)
        if not self.spark.catalog.tableExists(name):
            return  # nothing to clean (mirrors rmtree ignore_errors)
        if self._v2:
            vals = ", ".join(str(v) for v in values)
            self.spark.sql(f"DELETE FROM {name} WHERE {col} IN ({vals})")
            return
        for v in values:
            self.spark.sql(
                f"ALTER TABLE {name} DROP IF EXISTS PARTITION ({col}={v})"
            )

    def drop(self, kind: str) -> None:
        """Remove the whole table (used to invalidate the positions sidecar
        at compaction — the doc_ord remap makes every row stale)."""
        if not self.is_table_mode:
            import shutil

            shutil.rmtree(getattr(self.paths, kind), ignore_errors=True)
            return
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table_name(kind)}")

    # ---- stats (filesystem in every mode; see module docstring) ------------

    def write_stats(self, stats: dict) -> None:
        self.paths.write_stats(stats)

    def read_stats(self) -> dict:
        return self.paths.read_stats()

    def has_stats(self) -> bool:
        return self.paths.has_stats()
