"""Index snapshot / restore — the backup half of the ops story (Lucene's
SnapshotDeletionPolicy / ES snapshot API). Reference counterpart: none —
the reference's "checkpoint" is a model save (HF save_pretrained); this
engine's indexes are tables with a manifest commit protocol, and that
protocol is exactly what makes a snapshot safe:

* every read is MANIFEST-GATED (index/load.py), so a snapshot copies the
  manifest LAST — until it lands, the destination is not a loadable
  index; once it lands, everything the manifest names is already there.
  A crash mid-snapshot therefore leaves a visibly-incomplete directory,
  never a silently-wrong index (same write-then-manifest ordering as the
  build itself).
* rows belonging to UNCOMMITTED shards may be copied along with the data
  dirs (a concurrent ingest can be appending); they are invisible at the
  destination for the same reason they are invisible at the source — the
  snapshot's manifest (read FIRST) does not name them.

Path-mode only: catalog/Iceberg indexes get snapshots from the table
format itself (time travel / snapshot expiry), which is strictly better
than file copies — this module refuses rather than pretending.
"""

from __future__ import annotations

import os
import shutil

# data payloads first, manifest last — the commit point of the copy.
# stats.json rides with the data (it is required but tiny and rewritten
# whole, never appended).
_DATA_KINDS = (
    "stats.json",
    "dictionary",
    "docmap",
    "postings",
    "positions",
    "deletes",
    "metrics",
    "curation",
)
_COMMIT_KIND = "manifest"


def snapshot_index(index_dir: str, dest_dir: str, overwrite: bool = False) -> dict:
    """Copy a path-mode index to ``dest_dir``, manifest last. Returns
    {"copied": [kinds...], "dest": dest_dir}. The destination becomes a
    self-contained index loadable with load_index()."""
    manifest_src = os.path.join(index_dir, _COMMIT_KIND)
    if not os.path.isdir(manifest_src):
        raise FileNotFoundError(
            f"{index_dir} has no manifest — not a committed index "
            "(or a catalog-mode index: snapshot those via the table format)"
        )
    if os.path.exists(dest_dir):
        if not overwrite:
            raise FileExistsError(f"{dest_dir} exists (pass overwrite=True)")
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)
    copied = []
    for kind in _DATA_KINDS:
        src = os.path.join(index_dir, kind)
        dst = os.path.join(dest_dir, kind)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
            copied.append(kind)
        elif os.path.isfile(src):
            shutil.copy2(src, dst)
            copied.append(kind)
    # commit point: the manifest lands only after every payload it names
    shutil.copytree(manifest_src, os.path.join(dest_dir, _COMMIT_KIND))
    copied.append(_COMMIT_KIND)
    return {"copied": copied, "dest": dest_dir}


def restore_index(snapshot_dir: str, dest_dir: str, overwrite: bool = False) -> dict:
    """Restore a snapshot into ``dest_dir`` — the same manifest-last copy
    in the other direction (a snapshot IS an index, so restoring anywhere
    yields a loadable index; this exists so the restore path is also
    crash-safe rather than an ad-hoc cp -r)."""
    return snapshot_index(snapshot_dir, dest_dir, overwrite=overwrite)
