"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The architecture every real BPE trainer uses, made Ray-Data-first:

* the CORPUS-SCALE work is the word-frequency count — one map-side-combined
  exchange (`aggregates.partial_grouped_agg`) producing the (word, n)
  dictionary, which is vocabulary-sized (≈10⁶ rows for web corpora), not
  corpus-sized;
* the merge loop then runs EXACTLY on that dictionary on the driver: pair
  counts are weighted by word frequency, the best pair merges, only words
  containing the pair update.  100 TB of text changes the count pass, not
  the loop.
* determinism: ties break on (count desc, pair lexicographic) — identical
  merge tables at any partitioning (integer counts are exact).

`bpe_encode_batch` applies a learned merge table per batch with a per-actor
distinct-word cache (dictionary-encode → encode each distinct word once —
the Zipf curve makes this O(vocab), not O(tokens))."""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

END = "</w>"  # end-of-word sentinel (the original BPE formulation)


def word_frequency_dataset(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 2,
) -> rd.Dataset:
    """Corpus → DISTRIBUTED (word, n) dictionary, hapax-pruned.

    One streaming pass with map-side combine; the combined dictionary is
    then frequency-floored (``n >= min_count``) WHILE STILL A DATASET, so
    words below the floor never reach the driver.  On web text the
    distinct-token set is 10⁸–10⁹ rows of mostly count-1 garbage
    (typos, ids, hashes); the floor removes the long tail before any
    materialization.  The floor itself is applied exactly — on globally
    combined counts, never per-block partials.  Its EFFECT on BPE is a
    deliberate approximation: every pair's count is reduced by its
    sub-floor-word-supported mass, so two above-floor pairs whose exact
    counts differ by less than that mass can merge in a different order
    than exact BPE would pick (the learned tables are near-identical on
    natural text because hapax mass is a vanishing fraction of any pair a
    merge would select, but this is a corpus property, not a guarantee).
    Pass ``min_count=1`` for the exact unbounded dictionary."""
    from .aggregates import partial_grouped_agg

    def explode_words(b: pa.Table) -> pa.Table:
        col = b.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(pc.split_pattern(pc.coalesce(col, ""), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"word": toks})

    words = ds.map_batches(explode_words, batch_format="pyarrow")
    counted = partial_grouped_agg(words, ["word"], count_alias="n")
    if min_count > 1:
        floor = int(min_count)

        def apply_floor(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b.column("n"), floor))

        counted = counted.map_batches(apply_floor, batch_format="pyarrow")
    return counted


def word_frequencies(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int | None = 2_000_000,
    spill_dir: str | None = None,
) -> list[tuple[str, int]]:
    """Corpus → (word, count) pairs, sorted by (count desc, word).

    The driver-side dictionary is BOUNDED twice: ``min_count`` floors the
    frequency (hapax prune, see `word_frequency_dataset` for the exactness
    contract), and ``max_words`` caps the rows the driver will ever hold —
    when the floored vocabulary still exceeds it, only the top
    ``max_words`` by (count desc, word) — a distributed sort+limit, not a
    driver sort — are returned.  ``spill_dir`` (opt-in: a shared
    filesystem path on a multi-node cluster — Ray Data writes
    block-per-task, so a node-local path would scatter fragments across
    workers) additionally writes the FULL floored dictionary to parquet
    for offline inspection/resume before capping.  Pass ``min_count=1,
    max_words=None`` for the exact unbounded behaviour on small
    corpora."""
    counted = word_frequency_dataset(
        ds, text_col=text_col, min_count=min_count
    ).materialize()  # vocabulary-sized; lives in the object store, not the driver
    if max_words is not None and counted.count() > max_words:
        if spill_dir is not None:
            counted.write_parquet(spill_dir)
        counted = (
            counted.sort(["n", "word"], descending=[True, False])
            .limit(max_words)
        )
    rows = counted.take_all()
    return sorted(
        ((r["word"], int(r["n"])) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )


def bpe_train(
    ds: rd.Dataset,
    *,
    n_merges: int = 100,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int | None = 2_000_000,
    spill_dir: str | None = None,
) -> dict[str, Any]:
    """Learn a BPE merge table → {"merges": [(a, b)], "merge_counts": [int],
    "vocab": [str]}.  Exact greedy BPE over the distributed word-frequency
    dictionary (see module docstring); the dictionary the driver holds is
    bounded by ``min_count`` (hapax floor) and ``max_words`` (cap with
    parquet spill) — see `word_frequencies`."""
    freqs = word_frequencies(
        ds, text_col=text_col, min_count=min_count,
        max_words=max_words, spill_dir=spill_dir,
    )
    return bpe_train_from_frequencies(freqs, n_merges=n_merges)


def bpe_train_from_frequencies(
    freqs: list[tuple[str, int]], *, n_merges: int = 100
) -> dict[str, Any]:
    """The exact greedy merge loop over a (word, count) dictionary —
    driver-side by design (the dictionary is vocabulary-sized)."""
    words: list[list[str]] = [list(w) + [END] for w, _ in freqs]
    counts = [n for _, n in freqs]
    # pair → total count, and pair → set of word indexes containing it
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(wi: int, sign: int) -> None:
        seq = words[wi]
        c = counts[wi] * sign
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_count[p] = pair_count.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    merge_counts: list[int] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_count.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), c = best
        merges.append((a, b))
        merge_counts.append(c)
        ab = a + b
        for wi in list(pair_words.get((a, b), ())):
            seq = words[wi]
            add_word_pairs(wi, -1)  # retract old pairs
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[wi] = out
            add_word_pairs(wi, +1)
        pair_count.pop((a, b), None)
        pair_words.pop((a, b), None)
    vocab = sorted({s for seq in words for s in seq})
    return {"merges": merges, "merge_counts": merge_counts, "vocab": vocab}


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in learned-rank order (the canonical
    lowest-rank-first application)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in
                 enumerate(zip(seq, seq[1:]))]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        _, i = min(pairs)
        seq = seq[:i] + [seq[i] + seq[i + 1]] + seq[i + 2 :]
    return seq


class BPEEncoder:
    """Actor-pool stage: text batches → (id, token, pos) rows.  The merge
    rank table builds once per actor; each DISTINCT word in a block encodes
    once (dictionary-encode), with a cross-batch per-actor cache."""

    def __init__(self, merges: list[tuple[str, str]]) -> None:
        self.ranks = {tuple(p): r for r, p in enumerate(merges)}
        self.cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch.column("doc_id")
        out_id: list[int] = []
        out_tok: list[str] = []
        out_pos: list[int] = []
        for did, text in zip(ids.to_pylist(), col.to_pylist()):
            pos = 0
            for word in (text or "").split(" "):
                if not word:
                    continue
                toks = self.cache.get(word)
                if toks is None:
                    toks = bpe_encode_word(word, self.ranks)
                    self.cache[word] = toks
                for t in toks:
                    out_id.append(did)
                    out_tok.append(t)
                    out_pos.append(pos)
                    pos += 1
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "token": pa.array(out_tok, pa.string()),
            "pos": pa.array(out_pos, pa.int64()),
        })


def bpe_encode(ds: rd.Dataset, merges: list[tuple[str, str]],
               *, concurrency: int = 2, batch_size: int = 256) -> rd.Dataset:
    return ds.map_batches(
        BPEEncoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"merges": merges},
    )
