"""Flagship end-to-end KG construction pipeline (the reference's
run_complete_pipeline, /root/reference/src/workspace_kg/pipeline/
vespa_email_pipeline.py:526-622, re-expressed as Ray Data stages).

Two checkpointable stages:

**Stage 1 — extraction** (the expensive, per-document stage; at 100 TB this is
where the LLM/GPU budget goes):

    read_parquet(shards, include_paths=True)
      → map_batches(prepare_pages)            # text := extract_text(html), drop html
      → map_batches(TripleExtractor, concurrency=N)   # actor pool
      → write_parquet(extracted/, partition_cols=["shard"])

Resume is file-granular: shards with a complete lineage manifest are skipped
at the driver (an O(#shards) anti-join against the manifest dir — the Ray
analog of the reference's processed-ids filter, vespa_email_pipeline.py:
189-200). Shards are processed in **waves** so a long run checkpoints every
`wave_size` input files while each wave is still one streaming Dataset job.
Manifest metrics come from a metadata/column-pruned read-back of the written
files — extraction is never recomputed for accounting.

**Stage 2 — graph build** (the shuffle stages; cheap relative to stage 1 and
always derivable from the stage-1 checkpoint):

    read_parquet(extracted/)
      → explode mentions / triples
      → canonicalize (candidate keys → label propagation → group merge)
      → edge resolution joins + (src, dst, type) merge
      → write_parquet(nodes/, edges/)

The html binary column is dropped in the first map (SURVEY.md §7 "wide rows");
everything downstream of stage 1 carries only extracted columns.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.text_extract import extract_text
from ..stages.canonicalize import canonicalize
from ..stages.edges import materialize_edges
from ..stages.extract import TripleExtractor, explode_mentions, explode_triples
from ..state.manifests import Manifest, completed_shards, shard_name, write_manifest

EXTRACT_STAGE = "extract"
GRAPH_STAGE = "graph"


def prepare_pages(batch: pa.Table) -> pa.Table:
    """M1: recompute text from html (authoritative bytes), add the shard
    lineage column from the reader's `path`, drop html immediately.

    text is *always* re-derived when html is present so every run and every
    parallelism level observes the identical byte-for-byte text per url
    (the north-rule per-row invariant)."""
    names = batch.column_names
    if "path" in names:
        shards = [shard_name(p) for p in batch.column("path").to_pylist()]
        batch = batch.drop_columns(["path"]).append_column(
            "shard", pa.array(shards, pa.string())
        )
    if "html" in names:
        htmls = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist() if "text" in names else [""] * len(htmls)
        new_texts = [
            extract_text(h) if h is not None else (t or "")
            for h, t in zip(htmls, texts)
        ]
        if "text" in names:
            batch = batch.drop_columns(["text"])
        batch = batch.drop_columns(["html"]).append_column(
            "text", pa.array(new_texts, pa.large_string())
        )
    return batch


@dataclass
class KGBuildResult:
    work_dir: str
    extract_dir: str
    nodes_dir: str
    edges_dir: str
    manifest_dir: str
    metrics: dict[str, Any] = field(default_factory=dict)

    def nodes(self) -> rd.Dataset:
        return rd.read_parquet(self.nodes_dir)

    def edges(self) -> rd.Dataset:
        return rd.read_parquet(self.edges_dir)


def _shard_of(path: str, input_format: str) -> str:
    """Lineage shard name per source format (warc delegates to the single
    rule in sources/warc.py so manifests, partition dirs and the source's
    shard column can never drift)."""
    if input_format == "warc":
        from ..sources.warc import warc_shard_name

        return warc_shard_name(path)
    return shard_name(path)


def _read_pages(paths: list[str], input_format: str, all_paths: list[str]):
    """One wave of input shards → page Dataset (url/ord/html/...)."""
    if input_format == "parquet":
        return rd.read_parquet(paths, include_paths=True)
    if input_format == "warc":
        from ..sources.warc import read_warc

        # ordinals must be globally unique ACROSS waves: sequence files by
        # the full run's sorted input list, not this wave's slice
        return read_warc(paths, file_seq_paths=all_paths)
    raise ValueError(f"unknown input_format {input_format!r}")


def _input_rows(path: str) -> int:
    """Row count from the Parquet footer — no data read."""
    try:
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return -1


def _quarantine_fsspec_http() -> None:
    """Make concurrent Ray Data jobs thread-safe on hosts without aiohttp.

    Ray's path resolver re-imports ``fsspec.implementations.http`` on EVERY
    read (path_util._is_http_filesystem); with aiohttp absent that import
    fails with ModuleNotFoundError (caught by Ray) and is evicted from
    sys.modules, so it re-executes per read — and when two driver threads
    import it CONCURRENTLY (the overlap explode thread + the next wave's
    read) one can observe the other's half-initialized module, raising
    ``ImportError: cannot import name 'HTTPFileSystem'`` which escapes
    Ray's ModuleNotFoundError guard and kills the wave.  Pin a stub module
    once so every later import is a stable sys.modules hit; the stub class
    preserves failure semantics on actual use."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass
    if "fsspec.implementations.http" in sys.modules:
        return

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 - mirrors the real class name
        def __init__(self, *a: Any, **k: Any) -> None:
            raise ModuleNotFoundError("No module named 'aiohttp'")

    stub.HTTPFileSystem = HTTPFileSystem  # type: ignore[attr-defined]
    sys.modules["fsspec.implementations.http"] = stub


def _pre_explode_wave(
    work_dir: str, extract_dir: str, shards: list[str]
) -> None:
    """Overlap worker: explode one completed extraction wave into the
    pre-exploded mention/triple checkpoints (column-pruned reads of the
    just-written shard dirs).  Runs on a background driver thread WHILE the
    next wave extracts — Ray Data drives the two streaming topologies
    concurrently and the scheduler interleaves their tasks.  The marker JSON
    (shard list) is written only after both writes complete, so a kill
    mid-explode leaves no half-covered wave visible."""
    import hashlib
    import json as _json

    tag = hashlib.sha256("|".join(sorted(shards)).encode()).hexdigest()[:12]
    # read_parquet on a PATH LIST expects files, not dirs — expand explicitly
    shard_dirs = [
        os.path.join(extract_dir, f"shard={sh}", f)
        for sh in shards
        for f in sorted(os.listdir(os.path.join(extract_dir, f"shard={sh}")))
        if f.endswith(".parquet")
    ]
    jobs = (
        ("pre_mentions", ["url", "ord", "permissions", "entities"], explode_mentions),
        ("pre_triples", ["url", "ord", "permissions", "relationships"], explode_triples),
    )
    for sub, cols, fn in jobs:
        out = os.path.join(work_dir, sub, tag)
        shutil.rmtree(out, ignore_errors=True)
        rd.read_parquet(shard_dirs, columns=cols).map_batches(
            fn, batch_format="pyarrow"
        ).write_parquet(out)
    marker = os.path.join(work_dir, "pre_mentions", f"{tag}.done.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"shards": sorted(shards)}, f)
    os.replace(tmp, marker)


def _pre_explode_markers(work_dir: str) -> dict[str, list[str]]:
    """tag → covered shards, from completed overlap markers."""
    import json as _json

    d = os.path.join(work_dir, "pre_mentions")
    out: dict[str, list[str]] = {}
    if not os.path.isdir(d):
        return out
    for fn in os.listdir(d):
        if fn.endswith(".done.json"):
            try:
                with open(os.path.join(d, fn)) as f:
                    out[fn[: -len(".done.json")]] = list(_json.load(f)["shards"])
            except Exception:
                pass
    return out


def _invalidate_pre_explode(work_dir: str, shards: set[str]) -> None:
    """Drop any pre-exploded wave that covers a shard about to be
    re-extracted (its rows would otherwise appear twice)."""
    for tag, covered in _pre_explode_markers(work_dir).items():
        if shards.intersection(covered):
            os.remove(os.path.join(work_dir, "pre_mentions", f"{tag}.done.json"))
            for sub in ("pre_mentions", "pre_triples"):
                shutil.rmtree(os.path.join(work_dir, sub, tag), ignore_errors=True)


def run_extraction(
    input_paths: list[str],
    work_dir: str,
    *,
    batch_size: int = 128,
    concurrency: int | tuple[int, int] = 2,
    wave_size: int = 64,
    resume: bool = True,
    backend_factory: Callable[[], Any] | None = None,
    overlap: bool = False,
    input_format: str = "parquet",
) -> dict[str, Any]:
    """Stage 1. Returns summary metrics; outputs + manifests land under
    work_dir/extracted and work_dir/manifests.  ``input_format``:
    "parquet" (the default page table) or "warc" (Common-Crawl shards via
    sources/warc.py — same downstream schema).

    ``overlap=True`` pipelines stage 2's explode into stage 1: as each wave
    checkpoints, a background driver thread explodes it into pre-exploded
    mention/triple parquet while the NEXT wave extracts; run_graph_build
    consumes the pre-exploded checkpoints when (and only when) they exactly
    cover the extraction output, else falls back to exploding inline."""
    import threading

    if overlap:
        _quarantine_fsspec_http()
    extract_dir = os.path.join(work_dir, "extracted")
    manifest_dir = os.path.join(work_dir, "manifests")
    if not resume:
        shutil.rmtree(extract_dir, ignore_errors=True)
        for sub in ("pre_mentions", "pre_triples"):
            shutil.rmtree(os.path.join(work_dir, sub), ignore_errors=True)
        for sh in completed_shards(manifest_dir, EXTRACT_STAGE):
            try:
                os.remove(os.path.join(manifest_dir, f"{EXTRACT_STAGE}--{sh}.json"))
            except OSError:
                pass
    os.makedirs(extract_dir, exist_ok=True)

    done = completed_shards(manifest_dir, EXTRACT_STAGE) if resume else set()
    todo = [p for p in input_paths if _shard_of(p, input_format) not in done]
    skipped = len(input_paths) - len(todo)
    # shards being re-extracted make any prior pre-explosion of them stale
    _invalidate_pre_explode(
        work_dir, {_shard_of(p, input_format) for p in todo}
    )
    explode_thread: "threading.Thread | None" = None

    fn_kwargs = {}
    if backend_factory is not None:
        fn_kwargs["backend"] = backend_factory()

    t_total = time.monotonic()
    processed = 0
    for w in range(0, len(todo), wave_size):
        wave = todo[w : w + wave_size]
        t_wave = time.monotonic()
        # Drop partial output of manifest-less shards (a killed run may have
        # written files without completing the manifest) — rerun is clean.
        for p in wave:
            shutil.rmtree(
                os.path.join(extract_dir, f"shard={_shard_of(p, input_format)}"),
                ignore_errors=True,
            )
        ds = _read_pages(wave, input_format, input_paths)
        ds = ds.map_batches(prepare_pages, batch_format="pyarrow")
        if backend_factory is None:
            # Default backend: stateless-task extraction — read→prepare→
            # extract fuse into one task operator using every CPU (an actor
            # pool would statically reserve `concurrency` CPUs and starve
            # its feeder tasks at high CPU counts; see extract.extract_batch).
            from ..stages.extract import extract_batch

            ds = ds.map_batches(
                extract_batch, batch_format="pyarrow", batch_size=batch_size
            )
        else:
            ds = ds.map_batches(
                TripleExtractor,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
                fn_constructor_kwargs=fn_kwargs,
            )
        # Rebatch before the partitioned write: the extractor emits one block
        # per batch, and partition_cols pays ~0.25 s of dataset-writer setup
        # per block — fewer, larger blocks → fewer, larger files per shard.
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow", batch_size=4096)
        ds.write_parquet(extract_dir, partition_cols=["shard"])
        wave_wall = time.monotonic() - t_wave

        # Manifest metrics: column-pruned read-back of what was just written
        # (counts only — never recomputes extraction).
        stats = _readback_stats(
            extract_dir, [_shard_of(p, input_format) for p in wave]
        )
        for path in wave:
            sh = _shard_of(path, input_format)
            st = stats.get(sh, {})
            write_manifest(
                manifest_dir,
                Manifest(
                    stage=EXTRACT_STAGE,
                    input_file=path,
                    shard=sh,
                    rows_in=_input_rows(path),
                    rows_out=int(st.get("rows", 0)),
                    entity_mentions=int(st.get("entities", 0)),
                    raw_triples=int(st.get("triples", 0)),
                    errors=int(st.get("errors", 0)),
                    wall_s=round(wave_wall / max(1, len(wave)), 4),
                ),
            )
        processed += len(wave)

        if overlap:
            # one explode in flight: wait for the previous wave's explode,
            # then launch this wave's — it runs under the NEXT wave's
            # extraction (or drains after the loop for the last wave)
            if explode_thread is not None:
                explode_thread.join()
            explode_thread = threading.Thread(
                target=_pre_explode_wave,
                args=(work_dir, extract_dir,
                      [_shard_of(p, input_format) for p in wave]),
                daemon=True,
            )
            explode_thread.start()

    if explode_thread is not None:
        explode_thread.join()

    return {
        "shards_total": len(input_paths),
        "shards_processed": processed,
        "shards_skipped_resume": skipped,
        "extract_dir": extract_dir,
        "manifest_dir": manifest_dir,
        "wall_s": round(time.monotonic() - t_total, 3),
    }


def _shard_stats(part_dir: str) -> dict[str, int]:
    """Counts for one written shard dir (column-pruned read)."""
    if not os.path.isdir(part_dir):
        return {"rows": 0, "entities": 0, "triples": 0, "errors": 0}
    rows = ents = trips = errs = 0
    for fn in os.listdir(part_dir):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(part_dir, fn),
            columns=["entity_count", "relationship_count", "error"],
        )
        rows += t.num_rows
        ents += pc.sum(t.column("entity_count")).as_py() or 0
        trips += pc.sum(t.column("relationship_count")).as_py() or 0
        errs += pc.sum(
            pc.cast(pc.not_equal(t.column("error"), ""), pa.int64())
        ).as_py() or 0
    return {"rows": rows, "entities": ents, "triples": trips, "errors": errs}


def _readback_stats(extract_dir: str, shards: list[str]) -> dict[str, dict[str, int]]:
    """Per-shard counts from the written partition dirs, one Ray task per
    shard — the serial driver loop was a measured fixed cost (~15 s per
    500k-page run) that capped extraction-stage scaling."""
    import ray

    if len(shards) <= 4:
        return {sh: _shard_stats(os.path.join(extract_dir, f"shard={sh}")) for sh in shards}

    stats_task = ray.remote(num_cpus=0.5)(_shard_stats)
    refs = [
        stats_task.remote(os.path.join(extract_dir, f"shard={sh}")) for sh in shards
    ]
    return dict(zip(shards, ray.get(refs)))


def run_retry_failed(
    input_paths: list[str],
    work_dir: str,
    *,
    batch_size: int = 128,
    concurrency: int | tuple[int, int] = 2,
    backend_factory: Callable[[], Any] | None = None,
    input_format: str = "parquet",
) -> dict[str, Any]:
    """Re-drive failed extraction rows (the reference's RETRY_FAILED_EMAILS
    path, vespa_email_pipeline.py:262-263): rows whose ``error`` column is
    non-empty are re-extracted from their source pages and replaced in the
    stage-1 checkpoint, shard by shard (file-granular, resumable — a crash
    mid-retry leaves untouched shards valid).

    Failures are rare by construction (per-doc error records, not dead
    tasks), so the per-shard failed-url set is small; the page re-read is
    pruned to the affected shard files only."""
    import pyarrow.compute as pc_

    import ray.data as rd_

    extract_dir = os.path.join(work_dir, "extracted")
    manifest_dir = os.path.join(work_dir, "manifests")
    # retryable = real extraction failures; "Empty content" is a permanent
    # per-doc condition (entity_extractor.py:57-67), re-driving it can't help
    failed = (
        rd.read_parquet(extract_dir, columns=["url", "shard", "error"])
        .map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.not_equal(pc.coalesce(b.column("error").combine_chunks(), ""), ""),
                    pc.not_equal(b.column("error"), "Empty content"),
                )
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_failed = failed.count()
    if n_failed == 0:
        return {"failed_rows": 0, "retried": 0, "shards_rewritten": 0}

    from ..functions.joins import _dataset_to_table

    failed_tbl = _dataset_to_table(failed)
    by_shard: dict[str, set[str]] = {}
    for sh, url in zip(
        failed_tbl.column("shard").to_pylist(), failed_tbl.column("url").to_pylist()
    ):
        by_shard.setdefault(sh, set()).add(url)
    path_by_shard = {_shard_of(p, input_format): p for p in input_paths}
    # rewritten shards make any pre-explosion of them stale
    _invalidate_pre_explode(work_dir, set(by_shard))

    fn_kwargs = {}
    if backend_factory is not None:
        fn_kwargs["backend"] = backend_factory()

    retried = 0
    for sh, urls in sorted(by_shard.items()):
        src = path_by_shard.get(sh)
        if src is None:
            continue
        url_set = pa.array(sorted(urls), pa.string())
        pages = _read_pages([src], input_format, input_paths).map_batches(
            prepare_pages, batch_format="pyarrow"
        ).map_batches(
            lambda b, _u=url_set: b.filter(pc_.is_in(b.column("url"), value_set=_u)),
            batch_format="pyarrow",
        )
        redo = pages.map_batches(
            TripleExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=fn_kwargs,
        )
        redo_tbl = _dataset_to_table(redo.materialize()).drop_columns(["shard"])

        part_dir = os.path.join(extract_dir, f"shard={sh}")
        old_files = [
            os.path.join(part_dir, f)
            for f in sorted(os.listdir(part_dir))
            if f.endswith(".parquet")
        ]
        kept = [
            t
            for t in (pq.read_table(f) for f in old_files)
            if t.num_rows
        ]
        kept_tbl = pa.concat_tables(kept, promote_options="default")
        kept_tbl = kept_tbl.filter(
            pc_.invert(pc_.is_in(kept_tbl.column("url"), value_set=url_set))
        )
        merged = pa.concat_tables([kept_tbl, redo_tbl], promote_options="default")
        tmp = os.path.join(part_dir, "_retry_tmp.parquet")
        pq.write_table(merged, tmp)
        for f in old_files:
            os.remove(f)
        os.rename(tmp, os.path.join(part_dir, "retry-00000.parquet"))
        retried += redo_tbl.num_rows

        st = _readback_stats(extract_dir, [sh]).get(sh, {})
        write_manifest(
            manifest_dir,
            Manifest(
                stage=EXTRACT_STAGE,
                input_file=src,
                shard=sh,
                rows_in=_input_rows(src),
                rows_out=int(st.get("rows", 0)),
                entity_mentions=int(st.get("entities", 0)),
                raw_triples=int(st.get("triples", 0)),
                errors=int(st.get("errors", 0)),
                wall_s=0.0,
            ),
        )
    return {
        "failed_rows": n_failed,
        "retried": retried,
        "shards_rewritten": len(by_shard),
    }


def _usable_pre_explode(work_dir: str, extract_dir: str) -> "list[str] | None":
    """Tags of pre-exploded waves iff they exactly cover the extraction
    checkpoint (every shard once, none missing, every dir has files);
    anything off → None and the graph build explodes inline.  The check is
    O(#shards) directory metadata — never reads data."""
    markers = _pre_explode_markers(work_dir)
    if not markers:
        return None
    covered: list[str] = []
    for shards in markers.values():
        covered.extend(shards)
    if len(covered) != len(set(covered)):
        return None
    present = {
        d[len("shard="):]
        for d in os.listdir(extract_dir)
        if d.startswith("shard=")
    }
    if set(covered) != present:
        return None
    for sub in ("pre_mentions", "pre_triples"):
        for tag in markers:
            d = os.path.join(work_dir, sub, tag)
            if not os.path.isdir(d) or not any(
                f.endswith(".parquet") for f in os.listdir(d)
            ):
                return None
    return sorted(markers)


def run_graph_build(
    work_dir: str,
    *,
    num_partitions: int = 16,
    max_rounds: int = 8,
    output_partitions: int = 4,
    cc_driver_threshold: int = 3_000_000,
    embed: bool = False,
    embed_dim: int = 1024,
    embed_concurrency: int = 2,
    embed_backend=None,
    linking=None,
) -> dict[str, Any]:
    """Stage 2: extracted/ → nodes/ + edges/ (+ a global graph manifest).

    ``linking``: optional stages.linking.LinkingConfig enabling the fuzzy
    entity-linking candidate stage (embedding-ANN + alias dictionary); off
    by default — outputs are reference-parity exact-rule only."""
    extract_dir = os.path.join(work_dir, "extracted")
    manifest_dir = os.path.join(work_dir, "manifests")
    nodes_dir = os.path.join(work_dir, "nodes")
    edges_dir = os.path.join(work_dir, "edges")
    shutil.rmtree(nodes_dir, ignore_errors=True)
    shutil.rmtree(edges_dir, ignore_errors=True)

    t0 = time.monotonic()
    stage_s: dict[str, float] = {}

    def _tick(name: str, since: float) -> float:
        now = time.monotonic()
        stage_s[name] = round(now - since, 3)
        return now

    extracted = rd.read_parquet(extract_dir)
    pre = _usable_pre_explode(work_dir, extract_dir)
    if pre is not None:
        # overlap ran during extraction: the explode work is already on disk
        # as parquet (itself a checkpoint, so no materialize needed — both
        # mention consumers re-read it column-pruned)
        def _files(sub: str) -> list[str]:
            return [
                os.path.join(work_dir, sub, tag, f)
                for tag in pre
                for f in sorted(os.listdir(os.path.join(work_dir, sub, tag)))
                if f.endswith(".parquet")
            ]

        mentions = rd.read_parquet(_files("pre_mentions"))
        triples = rd.read_parquet(_files("pre_triples"))
    else:
        # mentions feed two consumers (pair generation + component attach):
        # materialize once instead of re-reading + re-exploding the checkpoint.
        mentions = extracted.map_batches(
            explode_mentions, batch_format="pyarrow"
        ).materialize()
        triples = extracted.map_batches(explode_triples, batch_format="pyarrow")
    t = _tick("explode_mentions", t0)

    nodes, with_comp = canonicalize(
        mentions,
        num_partitions=num_partitions,
        max_rounds=max_rounds,
        cc_driver_threshold=cc_driver_threshold,
        linking=linking,
    )
    t = _tick("canonicalize", t)
    from ..stages.canonicalize import LAST_TIMINGS as _canon_t

    for _k, _v in _canon_t.items():
        stage_s[f"canon.{_k}"] = _v
    edges = materialize_edges(triples, with_comp, nodes, num_partitions=num_partitions)
    from ..stages.edges import LAST_TIMINGS as _edge_t

    for _k, _v in _edge_t.items():
        stage_s[f"edges.{_k}"] = _v

    if embed:
        # schema.yaml:14 parity: every node/edge carries embedding FLOAT[dim]
        # at merge time (actor-pool stage; the model backend plugs in here)
        from ..stages.embedder import embed_edges, embed_nodes

        nodes_out = embed_nodes(
            nodes, dim=embed_dim, concurrency=embed_concurrency,
            backend=embed_backend,
        )
        edges_mat = embed_edges(
            edges, dim=embed_dim, concurrency=embed_concurrency,
            backend=embed_backend,
        ).materialize()
    else:
        nodes_out = nodes
        edges_mat = edges.materialize()
    t = _tick("edges", t)

    nodes_out.repartition(output_partitions).write_parquet(nodes_dir)
    edges_mat.repartition(output_partitions).write_parquet(edges_dir)
    t = _tick("write", t)

    n_nodes = nodes.count()
    n_edges = edges_mat.count()
    wall = time.monotonic() - t0
    write_manifest(
        manifest_dir,
        Manifest(
            stage=GRAPH_STAGE,
            input_file=extract_dir,
            shard="global",
            rows_in=extracted.count(),
            rows_out=n_nodes + n_edges,
            wall_s=round(wall, 3),
            extra={"nodes": n_nodes, "edges": n_edges},
        ),
    )
    return {
        "nodes": n_nodes,
        "edges": n_edges,
        "nodes_dir": nodes_dir,
        "edges_dir": edges_dir,
        "wall_s": round(wall, 3),
        "stage_s": stage_s,
    }


def kg_build(
    input_paths: list[str],
    work_dir: str,
    *,
    batch_size: int = 128,
    concurrency: int | tuple[int, int] = 2,
    num_partitions: int = 16,
    wave_size: int = 64,
    resume: bool = True,
    backend_factory: Callable[[], Any] | None = None,
    cc_driver_threshold: int = 3_000_000,
    embed: bool = False,
    embed_dim: int = 1024,
    embed_backend=None,
    linking=None,
    overlap: bool = False,
    input_format: str = "parquet",
) -> KGBuildResult:
    """Full pipeline: extraction (resumable) then graph build."""
    ext = run_extraction(
        input_paths,
        work_dir,
        batch_size=batch_size,
        concurrency=concurrency,
        wave_size=wave_size,
        resume=resume,
        backend_factory=backend_factory,
        overlap=overlap,
        input_format=input_format,
    )
    graph = run_graph_build(
        work_dir,
        num_partitions=num_partitions,
        cc_driver_threshold=cc_driver_threshold,
        embed=embed,
        embed_dim=embed_dim,
        embed_backend=embed_backend,
        linking=linking,
    )
    return KGBuildResult(
        work_dir=work_dir,
        extract_dir=ext["extract_dir"],
        nodes_dir=graph["nodes_dir"],
        edges_dir=graph["edges_dir"],
        manifest_dir=ext["manifest_dir"],
        metrics={"extraction": ext, "graph": graph},
    )
