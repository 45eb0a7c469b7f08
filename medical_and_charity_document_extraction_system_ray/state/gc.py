"""Retention cleanup — driver-side checkpoint GC.

The engine analog of the reference's ``cleanup_files``
(``backend/app/utils/file_utils.py:75-126``): delete files older than
``days`` matching ``pattern``, plus a checkpoint-aware variant that
removes orphaned ``*.tmp`` partition dirs (partial writes from a
killed job — safe to delete, the manifest only records completed
renames)."""

from __future__ import annotations

import glob
import os
import shutil
import time


def cleanup_files(directory: str, days: float, pattern: str = "*") -> list[str]:
    """Delete files under ``directory`` matching ``pattern`` older than
    ``days`` days (mtime).  Returns the deleted paths."""
    cutoff = time.time() - days * 86400.0
    deleted = []
    for path in glob.glob(os.path.join(directory, pattern)):
        if os.path.isfile(path) and os.path.getmtime(path) < cutoff:
            os.remove(path)
            deleted.append(path)
    return deleted


def cleanup_stale_partials(out_dir: str) -> list[str]:
    """Remove orphaned ``part-*.tmp`` dirs left by a killed run."""
    removed = []
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".tmp"):
            shutil.rmtree(os.path.join(out_dir, name))
            removed.append(name)
    return removed
