"""Exact-substring self-dedup (stages/dedup.substring_dedup).

Pytest oracle: a sequential brute-force reference — per doc, the set of
distinct n-token window strings; a window is a dup iff some SMALLER doc_id
contains the identical string.  Exercises planted cross-doc spans,
within-doc repeats (counted once), sub-window docs (zero rows), the
no-shared-windows shortcut, and partition invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.dedup import substring_dedup


def _ds(texts, ids=None, parts=3):
    if ids is None:
        ids = list(range(len(texts)))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(parts)


def _ref(texts, ids, n):
    wins = {}
    for i, t in zip(ids, texts):
        toks = (t or "").split(" ")
        wins[i] = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }
    first = {}
    for i in sorted(ids):
        for w in wins[i]:
            first.setdefault(w, i)
    return {
        i: (len(wins[i]), sum(1 for w in wins[i] if first[w] < i))
        for i in ids
    }


def _run(texts, ids=None, n=5, parts=3):
    if ids is None:
        ids = list(range(len(texts)))
    out = substring_dedup(_ds(texts, ids, parts), n=n).take_all()
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"]) for r in out}
    assert len(out) == len(ids)
    return got


def test_planted_spans_match_bruteforce():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(60)
    ]
    # plant exact spans: doc 50 copies an 8-token span of doc 3; doc 55
    # embeds doc 10 verbatim; doc 58 copies a span of doc 50 (chained)
    span = " ".join(texts[3].split(" ")[:8])
    texts[50] = "unique lead " + span + " unique tail"
    texts[55] = "prefix " + texts[10] + " suffix"
    texts[58] = span
    ids = list(range(60))
    got = _run(texts, ids, n=5)
    assert got == _ref(texts, ids, 5)
    assert got[50][1] > 0 and got[55][1] > 0 and got[58][1] > 0


def test_within_doc_repeat_counted_once():
    # the 5-token window "a b c a b" appears twice in doc 0 — distinct
    # count is by window STRING, so n_windows dedups the repeat
    t0 = "a b c a b c a b"  # windows: "a b c a b", "b c a b c", ... with a repeat
    texts = [t0, "z z z z z z", t0]
    got = _run(texts, n=5, parts=2)
    assert got == _ref(texts, [0, 1, 2], 5)
    # doc 2 is an exact copy of doc 0: every window is a dup
    assert got[2][1] == got[2][0] > 0


def test_short_and_empty_docs():
    texts = ["one two three", "", "a b c d e", "a b c d e"]
    got = _run(texts, n=5, parts=2)
    assert got[0] == (0, 0)
    assert got[1] == (0, 0)
    assert got[2] == (1, 0)
    assert got[3] == (1, 1)


def test_no_shared_windows_shortcut():
    texts = ["p q r s t u", "v w x y z aa", "bb cc dd ee ff gg"]
    got = _run(texts, n=5, parts=2)
    assert all(v == (2, 0) for v in got.values())


def test_partition_invariance():
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab → many shared windows
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 25)))
        for _ in range(80)
    ]
    ids = list(range(0, 160, 2))  # non-contiguous ids
    ref = _ref(texts, ids, 4)
    for parts in (1, 4, 9):
        assert _run(texts, ids, n=4, parts=parts) == ref


def test_sf0001_contract():
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    out = substring_dedup(
        rd.from_arrow(docs).repartition(4), n=13
    ).take_all()
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"]) for r in out}
    assert got == _ref(texts, ids, 13)


def test_boilerplate_strip_matches_reference():
    """Sequential oracle over planted boilerplate (same 20-word chunking)."""
    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import boilerplate_strip

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    boiler = " ".join(f"nav{i}" for i in range(20))  # one exact 20-word block
    texts = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=40))  # two body passages
        texts.append(boiler + " " + body if i % 3 == 0 else body)
    texts.append("")  # empty doc

    def chunks(t):
        toks = (t or "").split(" ")
        return [" ".join(toks[j:j + 20]) for j in range(0, len(toks), 20)]

    from collections import Counter
    df = Counter()
    for t in texts:
        for p in set(chunks(t)):
            df[p] += 1
    ref = {}
    for i, t in enumerate(texts):
        ch = chunks(t)
        kept = [p for p in ch if df[p] < 2]
        ref[i] = (" ".join(kept), len(kept), len(ch) - len(kept))

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    for parts in (1, 5):
        out = boilerplate_strip(
            rd.from_arrow(tbl).repartition(parts), min_df=2
        ).take_all()
        got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
               for r in out}
        assert got == ref, parts
    # the planted boilerplate block is gone from every doc
    assert all(boiler not in v[0] for v in ref.values())
    assert any(v[2] > 0 for v in ref.values())
