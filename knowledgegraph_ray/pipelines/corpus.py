"""End-to-end corpus curation: the CC-style training-data pipeline in a box.

Composes the engine's first-class stages into the pass a pretraining corpus
actually runs, in the canonical order (cheap filters first, so every later
stage sees fewer rows):

    read → quality gate (token floor + score floor, vectorized)
         → exact dedup (md5 groups, keep-min)
         → near-dup dedup (MinHash-LSH clusters, KEEP-BEST representative)
         → benchmark decontamination (13-gram verbatim overlap, optional)
         → gzipped-JSONL shard export (+ _index.json manifest)

Every stage is an existing, individually-oracled operator — this module is
pure composition plus a per-stage row ledger (the audit trail a curation
job reports).  All joins are id-keyed semi-joins through `adaptive_join`
(broadcast small side / hash exchange big side); nothing materializes the
corpus on the driver.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def curate_corpus(
    docs: rd.Dataset,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    quality_floor: float = 0.1,
    neardup: bool = True,
    decontam_bench: "pa.Table | None" = None,
    num_partitions: int = 16,
) -> dict[str, Any]:
    """Run the full curation pass; returns the per-stage row ledger plus the
    export manifest.  ``decontam_bench``: optional benchmark table with a
    ``text`` column — contaminated docs (any verbatim 13-gram overlap) are
    dropped, the GPT-3 convention."""
    from ..functions.joins import adaptive_join
    from ..sources.io_json import export_jsonl_gz
    from ..stages.dedup import dedup_keep_best, exact_dedup
    from ..stages.textops import add_quality_score, ngram_decontaminate

    ledger: dict[str, int] = {}
    ledger["input"] = docs.count()

    def gate(b: pa.Table) -> pa.Table:
        t = add_quality_score(b, text_col=text_col)
        keep = pc.and_(
            pc.greater_equal(t.column("n_tokens"), min_tokens),
            pc.greater_equal(t.column("quality_score"), quality_floor),
        )
        return b.filter(pc.fill_null(keep, False))

    gated = docs.map_batches(gate, batch_format="pyarrow").materialize()
    ledger["after_quality_gate"] = gated.count()

    deduped = exact_dedup(gated, text_col=text_col, id_col=id_col).materialize()
    ledger["after_exact_dedup"] = deduped.count()

    if neardup:
        keep = dedup_keep_best(
            deduped, text_col=text_col, id_col=id_col,
            num_partitions=num_partitions,
        ).select_columns([id_col])
        deduped = adaptive_join(
            deduped, keep, left_keys=[id_col], right_keys=[id_col],
            how="inner", num_partitions=num_partitions,
        ).materialize()
        ledger["after_neardup_dedup"] = deduped.count()

    if decontam_bench is not None:
        hits = ngram_decontaminate(
            deduped, decontam_bench, text_col=text_col, id_col=id_col
        ).select_columns([id_col])
        bad = {r[id_col] for r in hits.take_all()}  # contaminated ids: tiny
        if bad:
            bad_arr = pa.array(sorted(bad))
            deduped = deduped.map_batches(
                lambda b, _bad=bad_arr: b.filter(
                    pc.invert(pc.is_in(b.column(id_col), value_set=_bad))
                ),
                batch_format="pyarrow",
            ).materialize()
        ledger["after_decontamination"] = deduped.count()

    index = export_jsonl_gz(deduped, out_dir)
    ledger["exported"] = index["total_rows"]
    return {"ledger": ledger, "export": index, "out_dir": out_dir}
