"""BPE trainer (stages/bpe.py): exact-greedy parity with an independent
brute-force reference, partition invariance, and encode round-trips."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.stages.bpe import (
    END,
    bpe_encode,
    bpe_encode_word,
    bpe_train,
    bpe_train_from_frequencies,
    word_frequencies,
    word_frequency_dataset,
)


def _brute_force_bpe(freqs, n_merges):
    """Independent reference: recount EVERY pair from scratch each
    iteration (no incremental bookkeeping to share bugs with)."""
    words = {i: list(w) + [END] for i, (w, _) in enumerate(freqs)}
    counts = {i: n for i, (_, n) in enumerate(freqs)}
    merges, mcounts = [], []
    for _ in range(n_merges):
        pc_ = {}
        for i, seq in words.items():
            for a, b in zip(seq, seq[1:]):
                pc_[(a, b)] = pc_.get((a, b), 0) + counts[i]
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c <= 0:
            break
        merges.append((a, b))
        mcounts.append(c)
        for i, seq in words.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[i] = out
    return merges, mcounts


def test_bpe_matches_bruteforce_reference(ray_session):
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    freqs = word_frequencies(docs)
    got = bpe_train_from_frequencies(freqs, n_merges=25)
    want_merges, want_counts = _brute_force_bpe(freqs, 25)
    assert got["merges"] == want_merges
    assert got["merge_counts"] == want_counts
    # end-to-end wrapper agrees
    full = bpe_train(docs, n_merges=25)
    assert full["merges"] == want_merges


def test_word_frequencies_partition_invariant(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": [f"alpha beta beta gamma{' delta' * (i % 3)}" for i in range(200)],
    })
    f1 = word_frequencies(rd.from_arrow(t).repartition(1))
    f8 = word_frequencies(rd.from_arrow(t).repartition(8))
    assert f1 == f8
    assert f1[0] == ("beta", 400)


def test_bpe_encode_roundtrip(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": [f"lower lowest newer newest wide widest w{i % 5}" for i in range(60)],
    })
    ds = rd.from_arrow(t)
    model = bpe_train(ds, n_merges=40)
    # every encoded word's tokens concatenate back to word + END marker
    ranks = {tuple(p): r for r, p in enumerate(model["merges"])}
    for w in ("lower", "newest", "widest", "w3", "unseenword"):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + END
    enc = bpe_encode(ds, model["merges"], concurrency=2).take_all()
    by_doc: dict[int, list[str]] = {}
    for r in sorted(enc, key=lambda r: (r["doc_id"], r["pos"])):
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    joined = "".join(by_doc[0]).replace(END, " ").strip()
    assert joined == t.column("text")[0].as_py()
    # learned merges actually compress: fewer tokens than characters
    n_tokens = len(enc)
    n_chars = sum(len(x) for x in t.column("text").to_pylist())
    assert n_tokens < n_chars


def test_hapax_flood_never_reaches_driver(ray_session):
    """A planted flood of unique (count-1) words is pruned by the default
    min_count=2 floor WHILE STILL A DATASET: the bounded dictionary's row
    count equals the repeated vocabulary only, so the driver's take_all
    never sees the flood.  On web text this is the 10⁸⁺-hapax long tail."""
    n_docs = 400
    t = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        # 10 unique hapax "ids" per doc + 3 repeated real words
        "text": [
            " ".join(f"hapax{i}x{j}" for j in range(10))
            + " alpha beta beta"
            for i in range(n_docs)
        ],
    })
    ds = rd.from_arrow(t).repartition(8)
    bounded = word_frequency_dataset(ds, min_count=2)
    # the bound is asserted on the DATASET, before any driver materialization
    assert bounded.count() == 2  # alpha, beta — 4000 hapaxes gone
    freqs = word_frequencies(ds)
    assert freqs == [("beta", 2 * n_docs), ("alpha", n_docs)]
    # min_count=1 restores the exact unbounded behaviour
    full = word_frequencies(ds, min_count=1, max_words=None)
    assert len(full) == 2 + 10 * n_docs


def test_max_words_cap_spills_and_returns_top(ray_session, tmp_path):
    """When the floored vocabulary exceeds max_words the FULL dictionary
    spills to parquet and only the top max_words by (count desc, word)
    come back — a distributed sort+limit, never a driver-side cut."""
    words = []
    for i in range(50):
        words.extend([f"w{i:03d}"] * (100 - i))  # distinct counts: 100..51
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": [" ".join(words)],
    })
    spill = str(tmp_path / "vocab_spill")
    got = word_frequencies(
        rd.from_arrow(t).repartition(4),
        min_count=2, max_words=10, spill_dir=spill,
    )
    assert got == [(f"w{i:03d}", 100 - i) for i in range(10)]
    spilled = rd.read_parquet(spill).take_all()
    assert len(spilled) == 50  # the full dictionary survives on disk
    # capped training still runs and agrees with training on the top slice
    m_cap = bpe_train_from_frequencies(got, n_merges=5)
    assert len(m_cap["merges"]) == 5


def test_bpe_tiny_known_corpus():
    """The classic Sennrich example shape: 'es' (or the e-END pair) family
    must emerge among early merges on the {lower, lowest, newest, widest}
    corpus, and all counts are exact corpus-weighted."""
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = bpe_train_from_frequencies(freqs, n_merges=10)
    assert m["merges"][0] == ("e", "s")  # 9 occurrences, the clear max
    assert m["merge_counts"][0] == 9
    assert ("es", "t") in m["merges"][:3]
