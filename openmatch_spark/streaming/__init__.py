from openmatch_spark.streaming.incremental import incremental_index_available_now  # noqa: F401
