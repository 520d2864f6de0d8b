from openmatch_spark.index.build import build_index  # noqa: F401
from openmatch_spark.index.layout import IndexPaths  # noqa: F401
from openmatch_spark.index.load import load_index, BM25Index  # noqa: F401
from openmatch_spark.index.storage import IndexStorage  # noqa: F401
from openmatch_spark.index.compact import compact_auto, compact_index, plan_compaction  # noqa: F401
from openmatch_spark.index.deletes import delete_docs, upsert_docs  # noqa: F401
from openmatch_spark.index.positions import build_positions  # noqa: F401
from openmatch_spark.index.report import index_report  # noqa: F401
from openmatch_spark.index.snapshot import restore_index, snapshot_index  # noqa: F401
