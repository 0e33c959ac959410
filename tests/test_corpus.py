"""End-to-end corpus curation (pipelines/corpus.py): ledger correctness on a
corpus with planted low-quality docs, exact dups, near-dups and contaminated
docs; export round-trips."""

import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.pipelines.corpus import curate_corpus
from knowledgegraph_ray.sources.io_json import load_jsonl_gz

def _doc_text(i: int) -> str:
    # 40 hash-derived words: cross-document CHARACTER-shingle Jaccard ~0
    # (a shared word template like "tok{i}w{j}" would make every doc a
    # near-dup at the 5-char-shingle level)
    import hashlib

    return " ".join(
        hashlib.sha1(f"{i}-{j}".encode()).hexdigest()[:10] for j in range(40)
    )


def _corpus() -> pa.Table:
    rows = []
    for i in range(20):  # clean, mutually-dissimilar docs
        rows.append((i, _doc_text(i)))
    near = _doc_text(0).split()
    near[37] = "EDITED"  # one-token change → high-Jaccard near-dup of doc 0
    rows.append((100, " ".join(near)))
    rows.append((101, rows[1][1]))   # exact dup of doc 1
    rows.append((102, "short"))      # fails the token floor
    rows.append((103, "! ? . " * 10))  # punctuation junk → low score
    rows.append((104, _doc_text(50) + " contaminated snippet alpha beta "
                      "gamma delta epsilon zeta eta theta iota kappa lambda "
                      "mu nu"))
    ids, texts = zip(*rows)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_curate_corpus_ledger_and_export(ray_session, tmp_path):
    bench = pa.table({
        "text": ["contaminated snippet alpha beta gamma delta epsilon zeta "
                 "eta theta iota kappa lambda mu nu"]
    })
    res = curate_corpus(
        rd.from_arrow(_corpus()).repartition(3),
        str(tmp_path / "out"),
        min_tokens=10,
        quality_floor=0.1,
        decontam_bench=bench,
        num_partitions=4,
    )
    led = res["ledger"]
    assert led["input"] == 25
    assert led["after_quality_gate"] == 23          # drops 102 (short), 103 (junk)
    assert led["after_exact_dedup"] == 22           # drops 101 (dup of 1)
    assert led["after_neardup_dedup"] == 21         # collapses {0, 100}
    assert led["after_decontamination"] == 20       # drops 104
    assert led["exported"] == 20
    back = sorted(r["doc_id"] for r in load_jsonl_gz(res["out_dir"]).take_all())
    assert len(back) == 20
    assert 101 not in back and 102 not in back and 103 not in back
    assert 104 not in back
    assert (0 in back) != (100 in back)  # exactly one of the near-dup pair


def test_curate_corpus_short_bench_is_harmless(ray_session, tmp_path):
    """A decontamination bench with no 13-token n-grams must be a no-op,
    not a crash (empty bench index short-circuit)."""
    res = curate_corpus(
        rd.from_arrow(_corpus()).repartition(2),
        str(tmp_path / "out2"),
        min_tokens=10,
        quality_floor=0.1,
        decontam_bench=pa.table({"text": ["short benchmark prompt"]}),
        num_partitions=4,
    )
    led = res["ledger"]
    assert led["after_decontamination"] == led["after_neardup_dedup"]
