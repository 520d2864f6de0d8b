from openmatch_spark.streaming.incremental import incremental_index_available_now  # noqa: F401
from openmatch_spark.streaming.serve import serve_queries  # noqa: F401
