"""Operators — lazily re-exported (PEP 562); see query/__init__.py for the
measured worker-import rationale."""

_EXPORTS = {
    "save_as_trec": "runio",
    "load_from_trec": "runio",
    "trec_lines": "runio",
    "build_hard_negatives": "mining",
    "add_ground_truth": "mining",
    "combine_negatives": "mining",
    "depth_cut": "mining",
    "map_at_k": "metrics",
    "mrr_at_k": "metrics",
    "rbp_at_k": "metrics",
    "ndcg_at_k": "metrics",
    "recall_at_k": "metrics",
    "accuracy_at_k": "metrics",
    "duplicate_docs": "metrics",
    "decontaminate": "decontam",
    "decontaminate_corpus": "decontam",
    "cap_per_group": "sampling",
    "mixture_sample": "sampling",
    "mixture_report": "sampling",
    "seeded_uniform_col": "sampling",
    "grouped_split": "sampling",
    "ltr_features": "ltr",
    "pack_sequences": "packing",
    "boilerplate_lines": "boilerplate",
    "remove_boilerplate_lines": "boilerplate",
    "extract_snippets": "snippets",
    "chunk_passages": "chunking",
    "score_aggregate": "chunking",
    "adjacency_matrix_facets": "facets",
    "date_histogram_facets": "facets",
    "diversified_sample": "facets",
    "facet_counts": "facets",
    "multi_terms_facets": "facets",
    "rare_terms_facets": "facets",
    "bucket_script": "pipeline_aggs",
    "bucket_selector": "pipeline_aggs",
    "bucket_sort": "pipeline_aggs",
    "cumulative_sum": "pipeline_aggs",
    "derivative": "pipeline_aggs",
    "moving_fn": "pipeline_aggs",
    "serial_diff": "pipeline_aggs",
    "comb_fusion": "fusion",
    "reciprocal_rank_fusion": "fusion",
    "geo_bounding_box_filter": "geo",
    "geo_bounds": "geo",
    "geo_centroid": "geo",
    "geo_distance_search": "geo",
    "geotile_grid_facets": "geo",
}


def __getattr__(name):
    try:
        submod = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module 'openmatch_spark.operators' has no attribute {name!r}"
        ) from None
    import importlib

    obj = getattr(
        importlib.import_module(f"openmatch_spark.operators.{submod}"), name
    )
    globals()[name] = obj
    return obj


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
