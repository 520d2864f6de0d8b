"""Index loading: lazy DataFrames over the on-disk layout + frozen stats."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.index.layout import IndexPaths


@dataclass
class BM25Index:
    spark: SparkSession
    paths: IndexPaths
    stats: dict

    @property
    def dictionary(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.dictionary)

    @property
    def docmap(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.docmap)

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.postings)

    @property
    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.manifest)


def load_index(spark: SparkSession, index_dir: str) -> BM25Index:
    paths = IndexPaths(index_dir)
    return BM25Index(spark=spark, paths=paths, stats=paths.read_stats())
