from openmatch_spark.query.bm25_search import search  # noqa: F401
