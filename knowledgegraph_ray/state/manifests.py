"""Per-partition lineage manifests + checkpoint-resume bookkeeping.

Replaces the reference's driver-side progress tracker
(/root/reference/src/workspace_kg/pipeline/vespa_email_pipeline.py:46-232 —
an in-memory dict of processed/failed doc ids mirrored to a single JSON file,
saved after every batch) with the scale-correct equivalent: one small JSON
manifest per **input partition** (input Parquet shard), written atomically
(tmp + rename) next to that partition's stage output.

Resume is then an anti-join of the input shard list against the manifest
directory at the driver (file-granularity, O(#shards) — never O(rows)), the
Ray Data analog of the reference's "filter out already-processed ids"
(vespa_email_pipeline.py:189-200).

A manifest records lineage (input file, row count) and per-stage metrics
(docs in/out, entities, relationships, errors, wall seconds) — the fields the
north rule names for per-partition lineage.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class Manifest:
    """Lineage + metrics for one (stage, input shard) unit of work."""

    stage: str
    input_file: str
    shard: str
    rows_in: int = 0
    rows_out: int = 0
    entity_mentions: int = 0
    raw_triples: int = 0
    errors: int = 0
    wall_s: float = 0.0
    extra: dict = field(default_factory=dict)


def shard_name(input_file: str) -> str:
    """Stable shard id for an input file: its basename without extension."""
    base = os.path.basename(input_file)
    return base.rsplit(".", 1)[0]


def manifest_path(manifest_dir: str, stage: str, shard: str) -> str:
    return os.path.join(manifest_dir, f"{stage}--{shard}.json")


def write_manifest(manifest_dir: str, m: Manifest) -> str:
    """Atomic write: a manifest either exists complete or not at all, so a
    killed run can never leave a half-written checkpoint record."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = manifest_path(manifest_dir, m.stage, m.shard)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_manifests(manifest_dir: str, stage: str | None = None) -> dict[str, Manifest]:
    """shard → Manifest for every complete manifest (optionally one stage)."""
    out: dict[str, Manifest] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for fn in sorted(os.listdir(manifest_dir)):
        if not fn.endswith(".json"):
            continue
        st, _, rest = fn[: -len(".json")].partition("--")
        if stage is not None and st != stage:
            continue
        try:
            with open(os.path.join(manifest_dir, fn)) as f:
                data = json.load(f)
            out[data["shard"]] = Manifest(**data)
        except (json.JSONDecodeError, TypeError, KeyError, OSError):
            # Unreadable manifest == no checkpoint: the shard reruns.
            continue
    return out


def completed_shards(manifest_dir: str, stage: str) -> set[str]:
    return set(load_manifests(manifest_dir, stage=stage))
