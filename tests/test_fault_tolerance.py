"""Worker-death fault tolerance: a map_batches task whose worker process
dies mid-stream must be retried by Ray core and the pipeline must still
produce the exact result — the recovery a 256-node deployment leans on
when a node is preempted.

Mechanism: the task kills its own worker process (os._exit — not a Python
exception, which would be a fatal UserCodeException) the FIRST time each
block is seen; a /tmp marker file distinguishes the retry.  Ray retries
the crashed task on a fresh worker, which finds the marker and computes
normally.
"""

import os
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def test_map_batches_survives_worker_death(ray_session):
    marker_dir = tempfile.mkdtemp(prefix="kgray_fault_")
    run_id = uuid.uuid4().hex

    tbl = pa.Table.from_pydict({
        "k": pa.array(np.arange(2_000, dtype=np.int64) % 7),
        "v": pa.array(np.arange(2_000, dtype=np.int64)),
    })

    def crash_once(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = batch.column("v")[0].as_py()
        marker = os.path.join(marker_dir, f"{run_id}-{lo}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)  # simulate node preemption / OOM-kill
        return pa.Table.from_pydict({
            "k": batch.column("k"),
            "v2": pc.multiply(batch.column("v"), 2),
        })

    out = (
        rd.from_arrow(tbl).repartition(4)
        .map_batches(crash_once, batch_format="pyarrow", batch_size=None)
        .groupby("k")
        .sum("v2")
        .take_all()
    )
    got = {r["k"]: r["sum(v2)"] for r in out}
    ks = np.arange(2_000, dtype=np.int64) % 7
    vs = np.arange(2_000, dtype=np.int64) * 2
    want = {int(k): int(vs[ks == k].sum()) for k in range(7)}
    assert got == want
    # every block really did crash exactly once before succeeding
    assert len(os.listdir(marker_dir)) == 4
