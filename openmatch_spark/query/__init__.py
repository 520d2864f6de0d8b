from openmatch_spark.query.aggregates import (  # noqa: F401
    count_hits,
    hit_boxplot,
    hit_cardinality,
    hit_extended_stats,
    hit_filters,
    hit_median_absolute_deviation,
    hit_missing,
    hit_percentile_ranks,
    hit_percentiles,
    hit_stats,
    hit_string_stats,
    hit_t_test,
    hit_value_count,
    hit_weighted_avg,
    matrix_stats,
    top_metrics,
)
from openmatch_spark.query.bm25_search import search, search_terms  # noqa: F401
from openmatch_spark.query.boolean import search_boolean, search_terms_set  # noqa: F401
from openmatch_spark.query.dismax import (  # noqa: F401
    cross_fields_score_adhoc,
    dismax_score_adhoc,
)
from openmatch_spark.query.diversify import mmr_rerank  # noqa: F401
from openmatch_spark.query.dsl import compile_dsl, explain_dsl, search_dsl  # noqa: F401
from openmatch_spark.query.expand import (  # noqa: F401
    search_bool_prefix,
    search_fuzzy,
    search_prefix,
    search_regexp,
    search_synonyms,
    search_wildcard,
    wildcard_to_like,
)
from openmatch_spark.query.collapse import (  # noqa: F401
    collapse_run,
    host_key_col,
    search_collapsed,
)
from openmatch_spark.query.explain import explain_adhoc  # noqa: F401
from openmatch_spark.query.federated import (  # noqa: F401
    federated_stats,
    search_federated,
)
from openmatch_spark.query.filtered import search_filtered  # noqa: F401
from openmatch_spark.query.intervals import search_intervals  # noqa: F401
from openmatch_spark.query.mlt import mlt_terms, more_like_this  # noqa: F401
from openmatch_spark.query.spell import (  # noqa: F401
    correct_queries,
    suggest_spelling,
)
from openmatch_spark.query.paging import page_cursors, search_after  # noqa: F401
from openmatch_spark.query.phrase import (  # noqa: F401
    search_phrase,
    search_phrase_prefix,
    search_proximity,
    search_span_containing,
    search_span_first,
    search_span_near,
    search_span_not,
    search_span_or,
    search_span_within,
)
from openmatch_spark.query.bm25f import bm25f_score_adhoc, combined_fields_score_adhoc  # noqa: F401
from openmatch_spark.query.pq import pq_encode, pq_topk, pq_train  # noqa: F401
from openmatch_spark.query.quantize import (  # noqa: F401
    quantize_embeddings,
    quantized_topk,
)
from openmatch_spark.query.decay import (  # noqa: F401
    boosting_rescore,
    decay_rescore,
    distance_feature_rescore,
    field_value_factor_rescore,
    function_score,
    search_pinned,
)
from openmatch_spark.query.fielded import (  # noqa: F401
    build_fielded_index,
    compact_fielded_index,
    load_fielded_index,
    search_dsl_fielded,
    search_fielded,
)
from openmatch_spark.query.percolate import percolate  # noqa: F401
from openmatch_spark.query.phrase_suggest import suggest_phrases  # noqa: F401
from openmatch_spark.query.querystring import (  # noqa: F401
    parse_query_string,
    parse_query_string_grouped,
    search_query_string,
)
from openmatch_spark.query.simpleqs import (  # noqa: F401
    parse_simple_query_string,
    search_simple_query_string,
)
from openmatch_spark.query.rm3 import rm3_rescore_adhoc  # noqa: F401
from openmatch_spark.query.significant import (  # noqa: F401
    significant_terms,
    significant_text,
    term_vectors,
)
from openmatch_spark.query.sorted import (  # noqa: F401
    search_sorted,
    search_sorted_indexed,
)
from openmatch_spark.query.suggest import (  # noqa: F401
    suggest_completions,
    suggest_terms,
)
