from openmatch_spark.operators.runio import save_as_trec, load_from_trec, trec_lines  # noqa: F401
from openmatch_spark.operators.mining import (  # noqa: F401
    build_hard_negatives,
    add_ground_truth,
    combine_negatives,
    depth_cut,
)
from openmatch_spark.operators.metrics import (  # noqa: F401
    map_at_k,
    mrr_at_k,
    rbp_at_k,
    ndcg_at_k,
    recall_at_k,
    accuracy_at_k,
    duplicate_docs,
)
from openmatch_spark.operators.decontam import (  # noqa: F401
    decontaminate,
    decontaminate_corpus,
)
from openmatch_spark.operators.sampling import (  # noqa: F401
    cap_per_group,
    mixture_sample,
    mixture_report,
    seeded_uniform_col,
    grouped_split,
)
from openmatch_spark.operators.ltr import ltr_features  # noqa: F401
from openmatch_spark.operators.packing import pack_sequences  # noqa: F401
from openmatch_spark.operators.boilerplate import (  # noqa: F401
    boilerplate_lines,
    remove_boilerplate_lines,
)
from openmatch_spark.operators.snippets import extract_snippets  # noqa: F401
from openmatch_spark.operators.chunking import (  # noqa: F401
    chunk_passages,
    score_aggregate,
)
from openmatch_spark.operators.facets import (  # noqa: F401
    adjacency_matrix_facets,
    date_histogram_facets,
    diversified_sample,
    facet_counts,
    multi_terms_facets,
    rare_terms_facets,
)
from openmatch_spark.operators.pipeline_aggs import (  # noqa: F401
    bucket_script,
    bucket_selector,
    bucket_sort,
    cumulative_sum,
    derivative,
    moving_fn,
    serial_diff,
)
from openmatch_spark.operators.fusion import comb_fusion, reciprocal_rank_fusion  # noqa: F401
from openmatch_spark.operators.geo import (  # noqa: F401
    geo_bounding_box_filter,
    geo_bounds,
    geo_centroid,
    geo_distance_search,
    geotile_grid_facets,
)
