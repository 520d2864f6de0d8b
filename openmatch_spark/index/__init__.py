"""Index build/load/maintenance — lazily re-exported (PEP 562) so a Python
worker unpickling a codec/build kernel (e.g. from index.compact) does not
import the whole index package plus analysis; see query/__init__.py for the
measured worker-import rationale."""

_EXPORTS = {
    "build_index": "build",
    "IndexPaths": "layout",
    "load_index": "load",
    "BM25Index": "load",
    "IndexStorage": "storage",
    "compact_auto": "compact",
    "compact_index": "compact",
    "plan_compaction": "compact",
    "delete_docs": "deletes",
    "upsert_docs": "deletes",
    "build_positions": "positions",
    "index_report": "report",
    "restore_index": "snapshot",
    "snapshot_index": "snapshot",
}


def __getattr__(name):
    try:
        submod = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module 'openmatch_spark.index' has no attribute {name!r}"
        ) from None
    import importlib

    obj = getattr(
        importlib.import_module(f"openmatch_spark.index.{submod}"), name
    )
    globals()[name] = obj
    return obj


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
