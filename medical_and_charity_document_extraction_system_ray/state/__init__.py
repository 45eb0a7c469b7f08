from .checkpoint import load_manifest, partition_files, run_with_checkpoints

__all__ = ["load_manifest", "partition_files", "run_with_checkpoints"]
