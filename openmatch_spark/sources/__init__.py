from openmatch_spark.sources.readers import (  # noqa: F401
    read_corpus_tsv,
    read_corpus_jsonl,
    read_queries_tsv,
    read_qrels_tsv,
    read_beir_qrels,
)
