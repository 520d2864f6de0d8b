from openmatch_spark.functions.bm25 import bm25_weight, lucene_idf  # noqa: F401
from openmatch_spark.functions.codec import (  # noqa: F401
    varbyte_decode,
    varbyte_encode,
    delta_encode,
    delta_decode,
)
from openmatch_spark.functions.hashing import md5_rank_col  # noqa: F401
