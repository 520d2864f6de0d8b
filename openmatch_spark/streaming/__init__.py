from openmatch_spark.streaming.incremental import incremental_index_available_now  # noqa: F401
from openmatch_spark.streaming.serve import (  # noqa: F401
    serve_percolation,
    serve_queries,
)
