from .manifests import (
    Manifest,
    completed_shards,
    load_manifests,
    manifest_path,
    shard_name,
    write_manifest,
)

__all__ = [
    "Manifest",
    "completed_shards",
    "load_manifests",
    "manifest_path",
    "shard_name",
    "write_manifest",
]
