"""Text-analysis operators for large-scale training-data pipelines.

All oracle-checkable ops are pure vectorized pyarrow.compute kernels inside
``map_batches(batch_format="pyarrow")`` — no per-row Python in the hot path.
The heuristic ops (language id, rolling-hash fingerprint) are deterministic
per-row functions whose state (stopword tables, hash coefficients) is
module-level constant, so stateless map tasks stay cheap.

Semantics are pinned to be exactly reproducible in ANSI SQL (DuckDB) where an
oracle exists:
  * token count      == len(string_split(text, ' '))
  * punct count      == length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
  * quality score    == floor((least(n_tokens,200)/200.0) * (1-punct_ratio) * 1e4)/1e4
  * md5 fingerprint  == md5(text)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PUNCT_RE = r"[.!?,;:]"
TOKEN_CAP = 200  # quality saturation (docs past this length score max on length)


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens per row: single-space split, SQL string_split semantics
    (empty string → 1 token)."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    return batch.append_column("n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))


# GPT-2-style pretokenizer pattern (BPE-ish), RE2-compatible (no lookahead —
# pyarrow and DuckDB both run RE2, so counts agree bit-for-bit).
BPE_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def add_bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_bpe_tokens per row: non-overlapping matches of the GPT-2-style
    pretokenizer regex (contractions, letter runs, digit runs, punct runs,
    whitespace) — the standard proxy for BPE token cost without a merges
    table.  == DuckDB len(regexp_extract_all(text, pattern))."""
    n = pc.count_substring_regex(batch.column(text_col), pattern=BPE_TOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def add_normalized_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """norm_text: NFC-normalize → lowercase → collapse ASCII whitespace runs
    to one space → strip spaces.  All Arrow kernels (utf8proc + RE2), chosen
    to be bit-identical to DuckDB
    trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))
    (trim(characters=" ") matches SQL trim(); RE2 \\s on both sides)."""
    t = pc.utf8_normalize(batch.column(text_col), form="NFC")
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim(t, characters=" ")
    return batch.append_column("norm_text", t)


def add_punct_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    n = pc.count_substring_regex(batch.column(text_col), pattern=_PUNCT_RE)
    return batch.append_column("n_punct", pc.cast(n, pa.int64()))


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length-saturating quality score penalized by punctuation density.

    score = floor( min(n_tokens, 200)/200 * (1 - n_punct/len(text)) * 1e4 ) / 1e4
    (floor-canonicalized so Arrow and DuckDB produce bit-identical doubles)."""
    if "n_tokens" not in batch.column_names:
        batch = add_token_count(batch, text_col)
    if "n_punct" not in batch.column_names:
        batch = add_punct_count(batch, text_col)
    n_tok = pc.cast(batch.column("n_tokens"), pa.float64())
    n_punct = pc.cast(batch.column("n_punct"), pa.float64())
    length = pc.cast(pc.utf8_length(batch.column(text_col)), pa.float64())
    safe_len = pc.max_element_wise(length, 1.0)
    ratio = pc.divide(n_punct, safe_len)
    sat = pc.divide(pc.min_element_wise(n_tok, float(TOKEN_CAP)), float(TOKEN_CAP))
    raw = pc.multiply(sat, pc.subtract(1.0, ratio))
    score = pc.divide(pc.floor(pc.multiply(raw, 10000.0)), 10000.0)
    return batch.append_column("quality_score", score)


def add_md5_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (== DuckDB md5(text))."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


# ---------------------------------------------------------------------------
# PII masking (email / phone) — RE2 kernels, bit-identical to DuckDB
# regexp_replace(..., 'g') (both engines run RE2; no lookarounds used)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9\-\s()]{6,}[0-9]"


def add_pii_masked(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """masked_text + n_emails/n_phones: emails → <EMAIL> first, then phone
    runs → <PHONE> on the already-email-masked text (order pinned so the
    SQL oracle composes the same two regexp_replace calls)."""
    t = batch.column(text_col)
    n_emails = pc.cast(pc.count_substring_regex(t, pattern=_EMAIL_RE), pa.int64())
    masked = pc.replace_substring_regex(t, pattern=_EMAIL_RE, replacement="<EMAIL>")
    n_phones = pc.cast(pc.count_substring_regex(masked, pattern=_PHONE_RE), pa.int64())
    masked = pc.replace_substring_regex(masked, pattern=_PHONE_RE, replacement="<PHONE>")
    return (
        batch.append_column("n_emails", n_emails)
        .append_column("n_phones", n_phones)
        .append_column("masked_text", masked)
    )


# ---------------------------------------------------------------------------
# Gopher-style quality gates (Rae et al. 2021, "Scaling Language Models:
# Gopher" §A1.1 heuristics) — pure Arrow kernels, SQL-reproducible
# ---------------------------------------------------------------------------

GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1


def _floor4_pc(x: pa.Array):
    return pc.divide(pc.floor(pc.multiply(x, 10000.0)), 10000.0)


def add_gopher_flags(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-rule quality columns: mean_word_len (chars-without-spaces /
    n_tokens), symbol_ratio (('#' + '...') occurrences / n_tokens), and the
    combined gopher_keep gate — 50 ≤ n_tokens ≤ 100k, 3 ≤ mwl ≤ 10,
    symbol_ratio < 0.1.  Ratios are floor4-canonicalized so Arrow and DuckDB
    produce bit-identical doubles, and the gate compares the CANONICALIZED
    values on both sides."""
    if "n_tokens" not in batch.column_names:
        batch = add_token_count(batch, text_col)
    t = batch.column(text_col)
    n_tok = pc.cast(batch.column("n_tokens"), pa.float64())
    safe_tok = pc.max_element_wise(n_tok, 1.0)
    nospace = pc.cast(
        pc.utf8_length(pc.replace_substring(t, pattern=" ", replacement="")),
        pa.float64(),
    )
    mwl = _floor4_pc(pc.divide(nospace, safe_tok))
    n_sym = pc.cast(
        pc.add(pc.count_substring(t, pattern="#"), pc.count_substring(t, pattern="...")),
        pa.float64(),
    )
    sym_ratio = _floor4_pc(pc.divide(n_sym, safe_tok))
    keep = pc.and_(
        pc.and_(
            pc.and_(
                pc.greater_equal(n_tok, float(GOPHER_MIN_TOKENS)),
                pc.less_equal(n_tok, float(GOPHER_MAX_TOKENS)),
            ),
            pc.and_(
                pc.greater_equal(mwl, GOPHER_MIN_MWL),
                pc.less_equal(mwl, GOPHER_MAX_MWL),
            ),
        ),
        pc.less(sym_ratio, GOPHER_MAX_SYMBOL_RATIO),
    )
    return (
        batch.append_column("mean_word_len", mwl)
        .append_column("symbol_ratio", sym_ratio)
        .append_column("gopher_keep", keep)
    )


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (winnowing-style; no SQL equivalent)
# ---------------------------------------------------------------------------

_ROLL_BASE = np.uint64(1000003)
_ROLL_WINDOW = 8


def rolling_fingerprint(text: str) -> int:
    """Deterministic 63-bit doc fingerprint: min of rolling polynomial hashes
    over byte windows (a cheap winnowing selector)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size == 0:
        return 0
    if data.size < _ROLL_WINDOW:
        h = np.uint64(0)
        for b in data:
            h = h * _ROLL_BASE + np.uint64(b)
        return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))
    x = data.astype(np.uint64)
    powers = np.array(
        [_ROLL_BASE ** np.uint64(i) for i in range(_ROLL_WINDOW - 1, -1, -1)],
        dtype=np.uint64,
    )
    windows = np.lib.stride_tricks.sliding_window_view(x, _ROLL_WINDOW)
    hashes = (windows * powers).sum(axis=1, dtype=np.uint64)
    return int(hashes.min() & np.uint64(0x7FFFFFFFFFFFFFFF))


def add_rolling_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("roll_fp", pa.array(fps, pa.int64()))


# ---------------------------------------------------------------------------
# Language identification (stopword + script heuristic; no SQL equivalent)
# ---------------------------------------------------------------------------

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that for it with as on be at by this have from or".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit auf für von im den des sich".split()),
    "fr": frozenset("le la les de des et un une est pour dans que qui sur pas avec au du".split()),
    "es": frozenset("el la los las de y un una es para en que no con por del se su al".split()),
}


def detect_lang(text: str) -> str:
    """n-gram/stopword heuristic: CJK codepoint share → zh; else the language
    whose stopword list covers the most tokens; ties and no-signal → en."""
    if not text:
        return "unknown"
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > max(8, len(text[:400]) // 20):
        return "zh"
    toks = text.lower().split()[:200]
    if not toks:
        return "unknown"
    best_lang, best_hits = "en", 0
    for lang in ("en", "de", "fr", "es"):  # fixed order pins tie-breaks
        hits = sum(1 for t in toks if t in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "unknown"


def add_lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    langs = [detect_lang(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def top_terms(
    ds: "rd.Dataset",  # noqa: F821 - imported lazily to keep textops Arrow-only
    k: int = 50,
    text_col: str = "text",
):
    """Corpus-level term-frequency top-k — the canonical webtext wordcount.

    Tokens are ASCII ``[A-Za-z0-9]+`` runs lowercased per token (ASCII-only
    lowering, so any SQL oracle's ``lower()`` agrees byte-for-byte on every
    input).  Fully vectorized: one RE2 split over each batch buffer
    (``pc.split_pattern_regex``), flatten, then a per-batch ``value_counts``
    collapses the block to its distinct terms BEFORE the shuffle — the
    exchange moves O(distinct terms x blocks) rows, never the token count.
    The final groupby-sum output is Zipf-small; top-k is a sort+limit over
    group rows, not tokens."""
    from .aggregates import partial_grouped_agg

    def explode_counts(block: pa.Table) -> pa.Table:
        return _token_counts(block.column(text_col))

    counts = ds.map_batches(explode_counts, batch_format="pyarrow")
    agg = partial_grouped_agg(counts, ["term"], sums={"cnt": "cnt"})
    return agg.sort(["cnt", "term"], descending=[True, False]).limit(k)


def _token_counts(col) -> pa.Table:
    """(term, cnt) value-counts of the ASCII token runs of a string column:
    one RE2 split over the batch buffer, flatten, ASCII-lower, value_counts."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(col, "[^A-Za-z0-9]+")
    flat = pc.ascii_lower(pc.list_flatten(toks))
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = pc.value_counts(flat)
    return pa.table(
        {"term": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
    )


def top_terms_sketch(
    ds: "rd.Dataset",  # noqa: F821
    k: int = 50,
    capacity_per_block: int = 4096,
    text_col: str = "text",
    max_candidates: int = 2_000_000,
):
    """Heavy-hitter top-k via bounded per-block summaries + exact recount —
    the scale path for `top_terms` when the distinct-term universe (URLs,
    typos, code identifiers in webtext) is too large for a full groupby.

    Pass 1 ships at most ``capacity_per_block`` (term, cnt) rows per block
    plus that block's truncation threshold (the largest DROPPED count —
    SpaceSaving/Misra-Gries-style mergeable summary): a term absent from a
    block's summary occurred there at most ``threshold`` times, so after the
    partial-sum groupby every term has
    ``lower = sum(kept)``, ``upper = lower + Σ thresholds of blocks that
    dropped it``.  Terms with ``upper >=`` the k-th largest lower bound are
    the ONLY possible top-k members; pass 2 recounts exactly those terms
    exactly (broadcast candidate set, filtered value_counts) and sorts.  The
    output is therefore EXACT top-k — identical to `top_terms` — while the
    wide exchange is bounded by capacity x blocks instead of the distinct
    universe.

    The candidate count is data-dependent: Zipf-shaped corpora (natural
    text) prune to ~O(k), but a flat distribution can make every term a
    candidate.  The candidate set is broadcast through the object store, so
    it is capped at ``max_candidates``; past the cap the pruning buys
    nothing and the operator falls back to the exact full-groupby path."""
    import numpy as np

    import ray
    import ray.data as rd

    from .aggregates import partial_grouped_agg

    # sentinel for per-block threshold rows: "" is never a token (empties
    # are filtered by the tokenizer), so it cannot collide with a real term
    SENT = ""

    def summarize(block: pa.Table) -> pa.Table:
        t = _token_counts(block.column(text_col))
        thr = 0
        if t.num_rows > capacity_per_block:
            order = pc.sort_indices(
                t, sort_keys=[("cnt", "descending"), ("term", "ascending")]
            )
            t = t.take(order)
            thr = int(t.column("cnt")[capacity_per_block].as_py())
            t = t.slice(0, capacity_per_block)
        sent = pa.table(
            {"term": pa.array([SENT], pa.string()), "cnt": pa.array([thr], pa.int64()),
             "thr": pa.array([thr], pa.int64())}
        )
        t = t.append_column("thr", pa.array(np.full(t.num_rows, thr, np.int64)))
        return pa.concat_tables([t, sent])

    agg = partial_grouped_agg(
        ds.map_batches(summarize, batch_format="pyarrow"),
        ["term"], sums={"cnt": "cnt", "thr": "thr_present"},
    ).materialize()

    # total threshold mass, from the sentinel rows (one per block)
    sent_row = agg.filter(expr=f"term == '{SENT}'").take_all()
    total_thr = int(sent_row[0]["thr_present"]) if sent_row else 0
    terms = agg.filter(expr=f"term != '{SENT}'")

    # k-th largest lower bound (tiny driver take), then candidate pruning
    top_lower = terms.sort(["cnt", "term"], descending=[True, False]).limit(k).take_all()
    if not top_lower:
        return terms.select_columns(["term", "cnt"]).limit(0)
    kth_lower = int(top_lower[-1]["cnt"])

    # CERTIFICATION: a term absent from EVERY block summary has no agg row
    # and upper bound = total_thr.  The sketch output is exact top-k only
    # when such terms provably cannot rank: k summary-surviving terms exist
    # AND total_thr < kth_lower.  A Zipf head passes easily (heads dwarf the
    # per-block truncation thresholds); flat distributions fail and take the
    # exact full-groupby path instead of silently dropping rank candidates.
    if len(top_lower) < k or total_thr >= kth_lower:
        return top_terms(ds, k=k, text_col=text_col)

    def is_candidate(b: pa.Table) -> pa.Table:
        upper = pc.add(
            b.column("cnt"), pc.subtract(pa.scalar(total_thr), b.column("thr_present"))
        )
        return b.filter(pc.greater_equal(upper, kth_lower)).select(["term"])

    cand_ds = terms.map_batches(is_candidate, batch_format="pyarrow").materialize()
    if cand_ds.count() > max_candidates:
        # flat distribution: pruning bought nothing — exact path instead of
        # broadcasting an unbounded candidate set
        return top_terms(ds, k=k, text_col=text_col)
    cand_tbls = [
        t for t in ray.get(cand_ds.to_arrow_refs())
        if t.num_rows  # zero-row blocks may carry a degenerate empty schema
    ]
    cand_col = (
        pa.concat_tables(cand_tbls).column("term").combine_chunks()
        if cand_tbls else pa.array([], pa.string())
    )
    cand_ref = ray.put(cand_col)

    def recount(block: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)  # zero-copy from the local object store
        t = _token_counts(block.column(text_col))
        return t.filter(pc.is_in(t.column("term"), value_set=cand))

    exact = partial_grouped_agg(
        ds.map_batches(recount, batch_format="pyarrow"), ["term"], sums={"cnt": "cnt"}
    )
    return exact.sort(["cnt", "term"], descending=[True, False]).limit(k)


def tfidf_scores(
    ds: "rd.Dataset",  # noqa: F821
    n_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, term, tf, df, tfidf_r) for every distinct (doc, term) pair.

    tf comes from ONE per-block C++ group_by (a document never spans
    blocks); df is a map-side-combined groupby over the tf rows; df (Zipf-
    small) broadcasts back onto tf via the adaptive join.  The score uses
    rational arithmetic only — floor4(tf * N / df) with left-associated
    IEEE doubles — so any SQL engine computing the same expression yields
    bit-identical values (log-based idf would differ per-libm in the last
    ulp and straddle canonicalization boundaries)."""
    import numpy as np

    from ..functions.joins import adaptive_join
    from .aggregates import partial_grouped_agg

    def term_freqs(block: pa.Table) -> pa.Table:
        col = block.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, "[^A-Za-z0-9]+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        flat = pc.ascii_lower(pc.list_flatten(toks))
        t = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
                "term": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        return (
            t.group_by(["doc_id", "term"])
            .aggregate([("term", "count")])
            .rename_columns(["doc_id", "term", "tf"])
        )

    tf = ds.map_batches(term_freqs, batch_format="pyarrow").materialize()
    df = partial_grouped_agg(
        tf.select_columns(["term"]), ["term"], count_alias="df"
    )
    joined = adaptive_join(tf, df, left_keys=["term"], num_partitions=8)

    def score(block: pa.Table) -> pa.Table:
        tfv = block.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = block.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.floor(tfv * float(n_docs) / dfv * 10000.0) / 10000.0
        return pa.table(
            {
                "doc_id": block.column("doc_id"),
                "term": block.column("term"),
                "tf": pc.cast(block.column("tf"), pa.int64()),
                "df": pc.cast(block.column("df"), pa.int64()),
                "tfidf_r": pa.array(s, pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def doc_token_rows(batch: pa.Table, *, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """(doc_id, term) row per token occurrence — same tokenization as
    top_terms (ASCII [A-Za-z0-9]+ runs, ascii-lowered, empties dropped)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(col, ""), "[^A-Za-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.ascii_lower(pc.list_flatten(toks))
    parent = pc.list_parent_indices(toks)
    ids = batch.column(id_col).take(parent)
    keep = pc.not_equal(flat, "")
    return pa.table({"doc_id": ids.filter(keep), "term": flat.filter(keep)})


def token_commonness(
    ds: "rd.Dataset",  # noqa: F821
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus-statistic quality score (the CCNet/perplexity-filter shape,
    exact-integer variant): per document, the SUM of each token occurrence's
    GLOBAL corpus frequency, plus the token count — documents dominated by
    rare/garbage tokens score low relative to their length.

    Two passes, both shuffle-light:
      1. global term counts — per-block value_counts collapses each block to
         its distinct terms before one small groupby (top_terms machinery);
      2. per-doc scoring — token rows probe the BROADCAST term-count map
         (one shared zero-copy index, collision-checked; functions/joins),
         then a map-side-combined groupby sums per doc.
    All-integer arithmetic: the score is exactly reproducible in ANSI SQL
    (no log/float divergence between engines); a downstream filter divides
    commonness by n_tokens at display time.  At 100 TB the term map is the
    Zipf head — cap it with top_terms_sketch and bucket the tail as count 1
    (the standard CCNet binning); this exact path is the oracle."""
    from .aggregates import partial_grouped_agg
    from ..functions.joins import lookup_join

    tok = ds.map_batches(
        lambda b: doc_token_rows(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    counts = partial_grouped_agg(
        ds.map_batches(
            lambda b: _token_counts(b.column(text_col)), batch_format="pyarrow"
        ),
        ["term"], sums={"cnt": "cnt"},
    ).materialize()
    joined = lookup_join(
        tok, counts.to_arrow_refs(), left_keys=["term"], how="inner",
        right_schema=pa.schema([("term", pa.string()), ("cnt", pa.int64())]),
    )
    return partial_grouped_agg(
        joined.select_columns(["doc_id", "cnt"]), ["doc_id"],
        sums={"cnt": "commonness"}, count_alias="n_tokens",
    )


def explode_sentences(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = r"[.!?]+\s+",
) -> pa.Table:
    """Sentence segmentation as a pure batch map: explode each document into
    (doc_id, sent_idx, sentence) rows, 1-based index in document order.

    Fully vectorized — ONE RE2 ``split_pattern_regex`` per batch, then
    offset math re-windows the flat values (no per-row Python, no string
    copies).  The boundary regex avoids lookbehind (RE2 has none), so the
    split is reproducible by any RE2-based engine — DuckDB's
    ``regexp_split_to_array`` yields the identical list, which is the
    oracle.  Terminator characters stay attached to the LEFT sentence's
    final word minus the matched separator (i.e. the split consumes
    ``[.!?]+<ws>``); trailing empty pieces are kept to mirror SQL."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    parts = pc.split_pattern_regex(col, pattern)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = parts.offsets.to_numpy().astype(np.int64)
    counts = np.diff(off)
    total = int(counts.sum())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    sent_idx = (
        np.arange(total, dtype=np.int64) - np.repeat(off[:-1], counts) + 1
    )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
            "sent_idx": pa.array(sent_idx, pa.int64()),
            "sentence": parts.flatten(),
        }
    )


def normalize_urls(
    batch: pa.Table,
    *,
    url_col: str = "url",
    out_col: str = "url_norm",
) -> pa.Table:
    """Canonicalize URLs for dedup/grouping — the Common-Crawl staple:
    lowercase scheme and host, strip a leading ``www.``, drop the scheme's
    default port (http:80 / https:443), drop query string and fragment,
    trim trailing slashes from the path.  Rows that don't parse as
    ``scheme://host...`` pass through unchanged.

    Fully vectorized: one RE2 ``extract_regex`` + a handful of utf8/regex
    kernels per batch.  Every step is RE2 + lower(), so an SQL engine with
    RE2 regexps (DuckDB) reproduces the output bit-for-bit — that mirror is
    the oracle."""
    raw = batch.column(url_col)
    if isinstance(raw, pa.ChunkedArray):
        raw = raw.combine_chunks()
    # keep the ORIGINAL (nullable) column for the pass-through branch: a
    # fill_null('') there would silently rewrite NULL urls to '' and bucket
    # every null row into one dedup key (SQL regexp chains propagate NULL)
    col = pc.fill_null(raw, "")
    m = pc.extract_regex(
        col,
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
        r"(?P<host>[^/?#]*)(?P<path>[^?#]*)",
    )
    ok = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    host = pc.utf8_lower(pc.struct_field(m, "host"))
    path = pc.struct_field(m, "path")
    host = pc.replace_substring_regex(host, r"^www\.", "", max_replacements=1)
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, r":443$", "", max_replacements=1),
        pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, r":80$", "", max_replacements=1),
            host,
        ),
    )
    path = pc.replace_substring_regex(path, r"/+$", "", max_replacements=1)
    norm = pc.binary_join_element_wise(scheme, "://", host, path, "")
    return batch.append_column(out_col, pc.if_else(ok, norm, raw))


def _levenshtein_to_probe(col: pa.Array, probe: str) -> np.ndarray:
    """Edit distance from every string in ``col`` to ONE probe string —
    Wagner-Fischer vectorized ACROSS THE BATCH.

    The classic DP has a sequential dependency along the string axis
    (``new[j]`` needs ``new[j-1]``); we break it with the min-plus-scan
    identity ``new[j] = min_{k<=j}(cand[k] + (j-k))`` =
    ``minimum.accumulate(cand - j) + j``, so each probe character costs a
    handful of O(batch × maxlen) numpy kernels and the only Python loop is
    over the probe's characters (short by contract).  Strings decode once
    per batch to a padded UTF-32 code matrix; NUL padding can't collide
    because Arrow strings never contain NUL in this corpus and lengths come
    from ``pc.utf8_length``, not the padding.

    Unit-cost edits, case-sensitive — bit-identical to DuckDB
    ``levenshtein(s, probe)``, which is the oracle."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    out = np.zeros(n, np.int64)
    if n == 0:
        return out
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    lens = pc.fill_null(pc.utf8_length(col), 0).to_numpy(zero_copy_only=False)
    names = pc.fill_null(col, "").to_pylist()
    arr = np.array(names, dtype="U")
    maxlen = arr.dtype.itemsize // 4
    pcodes = np.frombuffer(np.array([probe], dtype=f"U{max(len(probe), 1)}")
                           .tobytes(), np.uint32)[: len(probe)]
    if maxlen == 0:
        out[:] = len(probe)
        out[~valid] = 0
        return out
    codes = arr.view(np.uint32).reshape(n, maxlen)
    idx = np.arange(maxlen + 1, dtype=np.int64)
    d = np.broadcast_to(idx, (n, maxlen + 1)).copy()
    full = np.empty((n, maxlen + 1), np.int64)
    for i, pch in enumerate(pcodes, start=1):
        sub = (codes != pch).astype(np.int64)
        full[:, 0] = i
        np.minimum(d[:, 1:] + 1, d[:, :-1] + sub, out=full[:, 1:])
        np.subtract(full, idx, out=full)
        np.minimum.accumulate(full, axis=1, out=full)
        np.add(full, idx, out=full)
        d, full = full, d
    out = np.take_along_axis(d, lens[:, None].astype(np.int64), axis=1)[:, 0]
    out[~valid] = 0
    return out


def add_min_levenshtein(
    batch: pa.Table,
    probes: list[str],
    *,
    text_col: str = "s_name",
    out_col: str = "min_lev",
) -> pa.Table:
    """min over ``probes`` of levenshtein(row, probe) — the fuzzy-match
    primitive (typo'd surface forms vs an alias dictionary; the scored
    companion to stages/linking.py's candidate generation).  One broadcast
    probe list, one padded-code-matrix DP per probe, no shuffle.
    == DuckDB LEAST(levenshtein(col,'p1'), ...).  Null rows → null."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dists = np.stack([_levenshtein_to_probe(col, p) for p in probes])
    best = dists.min(axis=0)
    mask = pc.is_valid(col)
    return batch.append_column(
        out_col, pc.if_else(mask, pa.array(best, pa.int64()), pa.scalar(None, pa.int64()))
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (exact n-gram overlap)
# ---------------------------------------------------------------------------

def _window_token_hashes(col, n: int):
    """Per-document n-token window hashes over single-space tokens
    (string_split(text, ' ') semantics — empty tokens kept, so the window
    STRING joined with ' ' is exactly what SQL's array_to_string emits).

    Fully vectorized: one rolling-polynomial pass hashes every token from
    the flat byte buffer (functions/hashing), then each window hash is n
    shifted multiply-adds over the token-hash array (uint64 wraparound) —
    no per-token Python.  Returns (flat_tokens, win_start, win_doc, win_hash)
    where win_start indexes flat_tokens and win_doc indexes the batch rows;
    windows never span documents."""
    from ..functions.hashing import prefix_arrays, segment_hashes, string_flat_bytes

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(col, ""), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    cnt = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    data, offsets = string_flat_bytes(flat)
    bpow, S = prefix_arrays(data)
    th = segment_hashes(bpow, S, offsets[:-1], offsets[1:])  # uint64/token
    T = th.size
    if T < n:
        return flat, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint64)
    # window polynomial over token hashes: wh_i = Σ_j th[i+j]·C^(n−1−j)
    C = np.uint64(0x9E3779B97F4A7C15)
    wh = th[: T - n + 1].copy()
    for j in range(1, n):
        wh *= C
        wh += th[j : T - n + 1 + j]
    tok_doc = np.repeat(np.arange(cnt.size, dtype=np.int64), cnt)
    valid = tok_doc[: T - n + 1] == tok_doc[n - 1 :]
    win_start = np.nonzero(valid)[0].astype(np.int64)
    return flat, win_start, tok_doc[win_start], wh[win_start]


def build_bench_ngrams(bench: pa.Table, *, n: int = 13,
                       text_col: str = "text") -> dict:
    """Distinct n-gram index of a BENCHMARK table (small by definition —
    an eval/test set): window hash → tuple of exact n-gram strings with
    that hash.  Built once, `ray.put` by the caller, probed zero-copy-ish
    by every scan task; the strings make the final match EXACT (a hash
    collision is rejected by string comparison), so the SQL mirror is a
    plain string join."""
    flat, win_start, _, wh = _window_token_hashes(bench.column(text_col), n)
    index: dict = {}
    toks = flat.to_pylist()
    seen: set = set()
    for s, h in zip(win_start.tolist(), wh.tolist()):
        g = " ".join(toks[s : s + n])
        if g in seen:
            continue
        seen.add(g)
        index.setdefault(h, []).append(g)
    return {h: tuple(v) for h, v in index.items()}


def ngram_decontaminate(
    ds: "rd.Dataset",  # noqa: F821
    bench: pa.Table,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Benchmark decontamination — the GPT-3-style exact n-gram overlap
    check every training-data pipeline runs before training: for each
    corpus document, count its token windows that appear verbatim (exact
    n-token-gram, single-space join) in the benchmark set; emit
    (id, n_hits) for contaminated docs (n_hits ≥ 1) so the caller can
    drop or flag them.

    Scale shape: the benchmark index is built ONCE (it is the small side
    by definition) and broadcast via ``ray.put``; the corpus is one
    streaming map pass — per batch, vectorized window hashes, an
    ``np.searchsorted`` prune against the sorted bench hash array, then an
    exact string verify of the (rare) candidates.  No shuffle, no state,
    no driver materialization of the corpus."""
    import ray

    index = build_bench_ngrams(bench, n=n, text_col=text_col)
    bench_hashes = np.sort(np.fromiter(index.keys(), np.uint64, len(index)))
    shared = ray.put((bench_hashes, index))

    def scan(b: pa.Table) -> pa.Table:
        hashes, idx = ray.get(shared)
        flat, win_start, win_doc, wh = _window_token_hashes(
            b.column(text_col), n
        )
        hits = np.zeros(b.num_rows, np.int64)
        # hashes can be EMPTY (bench shorter than n tokens): pos==0 would
        # index into a zero-length array — nothing can be contaminated
        if wh.size and hashes.size:
            pos = np.searchsorted(hashes, wh)
            pos[pos == hashes.size] = 0
            cand = np.nonzero(hashes[pos] == wh)[0]
            if cand.size:
                toks = flat.to_pylist()
                for c in cand.tolist():
                    s = int(win_start[c])
                    if " ".join(toks[s : s + n]) in idx[int(wh[c])]:
                        hits[win_doc[c]] += 1
        keep = hits > 0
        return pa.table({
            id_col: b.column(id_col).filter(pa.array(keep)),
            "n_hits": pa.array(hits[keep], pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

def bm25_topk(
    ds: "rd.Dataset",  # noqa: F821
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Top-k documents by BM25 (the standard lexical retrieval scorer; the
    ranking companion to ``tfidf_scores``) for a fixed query-term set.

    score(d) = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl)),
    idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))  (the Lucene/ATIRE
    positive variant).  Floored to 1e-4 cells with a PINNED float
    expression tree — idf scalars form once from exact ints, per-term
    contributions add in fixed query order — so an SQL engine evaluating
    the mirrored formula produces the identical double (ln agrees to ~1
    ulp between libms; the floor4 convention q_quality/q_user_entropy
    established).  Tokenization matches the corpus ops: ASCII [A-Za-z0-9]+
    runs, lowered.

    Scale shape: ONE tokenizing map pass emits per-doc (dl, tf per term) —
    a doc never spans blocks, so per-block stats are final; corpus scalars
    (N, Σdl, df_t) are one tiny aggregate; scoring + per-block top-k prune
    is a second map (exchange O(k × blocks)); the final sort is k rows.
    No shuffle of the corpus."""
    import ray
    import ray.data as rd  # noqa: F401
    import math

    terms = [t.lower() for t in query_terms]
    m = len(terms)

    def per_doc(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(col, ""), "[^A-Za-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.ascii_lower(pc.list_flatten(toks))
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        cols = {
            id_col: batch.column(id_col),
            "_dl": pa.array(
                np.bincount(parent[keep], minlength=n).astype(np.int64)
            ),
        }
        for i, t in enumerate(terms):
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False) & keep
            cols[f"_tf{i}"] = pa.array(
                np.bincount(parent[mask], minlength=n).astype(np.int64)
            )
        return pa.Table.from_pydict(cols)

    stats = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    # corpus scalars: N (all docs), Σdl, df_t — one tiny combine over
    # per-block partial sums (O(blocks) rows to the driver)
    def partial(bt: pa.Table) -> pa.Table:
        row = {"_n": [bt.num_rows],
               "_sdl": [int(pc.sum(bt.column("_dl")).as_py() or 0)]}
        for i in range(m):
            row[f"_df{i}"] = [int(pc.sum(
                pc.cast(pc.greater(bt.column(f"_tf{i}"), 0), pa.int64())
            ).as_py() or 0)]
        return pa.Table.from_pydict(row)

    agg = pa.concat_tables(
        [t for t in ray.get(
            stats.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ) if t.num_rows]
    )
    N = int(pc.sum(agg.column("_n")).as_py() or 0)
    sdl = int(pc.sum(agg.column("_sdl")).as_py() or 0)
    if N == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    avgdl = float(sdl) / float(N)
    idf = []
    for i in range(m):
        df = int(pc.sum(agg.column(f"_df{i}")).as_py() or 0)
        idf.append(math.log(1.0 + (N - df + 0.5) / (df + 0.5)))

    def score_topk(bt: pa.Table) -> pa.Table:
        dl = bt.column("_dl").to_numpy(zero_copy_only=False).astype(np.float64)
        # k1·(1 − b + b·dl/avgdl), written exactly as the SQL mirror
        denom_add = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(bt.num_rows, np.float64)
        matched = np.zeros(bt.num_rows, np.int64)
        for i in range(m):  # fixed query order: float adds associate L→R
            tf = bt.column(f"_tf{i}").to_numpy(zero_copy_only=False)
            matched += tf
            tff = tf.astype(np.float64)
            s = s + idf[i] * (tff * (k1 + 1.0)) / (tff + denom_add)
        s = np.floor(s * 1e4) / 1e4
        sel = np.nonzero(matched > 0)[0]
        if sel.size > k:  # per-block prune: top-k by (−score, id)
            ids = bt.column(id_col).to_numpy(zero_copy_only=False)[sel]
            order = np.lexsort((ids, -s[sel]))[:k]
            sel = sel[order]
        return pa.table({
            id_col: bt.column(id_col).take(pa.array(sel, pa.int64())),
            "score": pa.array(s[sel], pa.float64()),
        })

    cand = pa.concat_tables(
        [t for t in ray.get(
            stats.map_batches(score_topk, batch_format="pyarrow")
            .to_arrow_refs()
        ) if t.num_rows]
    )
    if cand.num_rows == 0:
        return cand
    ids = cand.column(id_col).to_numpy(zero_copy_only=False)
    sc = cand.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return cand.take(pa.array(order, pa.int64()))


def chunk_token_windows(
    ds: "rd.Dataset",  # noqa: F821
    *,
    size: int = 64,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Overlapping token-window chunking — the RAG/embedding-prep splitter
    (the fixed-window companion to the paragraph-boundary
    ``explode_passages``): one chunk per window start 0, stride, 2·stride…
    while the start is inside the doc; chunk text = the next ``size``
    tokens joined by ' ' (string_split(' ') semantics, so the SQL mirror
    is a list-slice).  → (id, chunk_id, chunk).

    Vectorized: per batch, ONE tokenize, then one ``pc.list_slice`` +
    ``pc.binary_join`` per window ORDINAL (⌈max_tokens/stride⌉ kernel
    calls, never a per-doc loop).  Pure streaming map — no shuffle; at
    100 TB the output is written partitioned by input shard like every
    exploded table here."""

    def chunks(b: pa.Table) -> pa.Table:
        col = b.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(col, ""), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column(id_col)
        out_id, out_k, out_chunk = [], [], []
        max_k = int(-(-int(n.max()) // stride)) if len(n) else 0
        for k in range(max_k):
            sel = np.nonzero(n > k * stride)[0]
            if not sel.size:
                break
            sel_pa = pa.array(sel, pa.int64())
            sl = pc.list_slice(toks.take(sel_pa), k * stride,
                               k * stride + size)
            out_id.append(ids.take(sel_pa))
            out_k.append(pa.array(np.full(sel.size, k, np.int64)))
            out_chunk.append(pc.binary_join(sl, " "))
        if not out_id:
            return pa.table({id_col: pa.array([], ids.type),
                             "chunk_id": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_id]),
            "chunk_id": pa.concat_arrays(out_k),
            "chunk": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_chunk]),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def inverted_index(
    ds: "rd.Dataset",  # noqa: F821
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> "rd.Dataset":
    """Inverted-index build: term → (df, total tf, ascending posting list).

    The retrieval-infra sink a training-data pipeline needs next to BM25:
    same ASCII ``[A-Za-z0-9]+``-lowercase token convention as `top_terms`
    (so the SQL oracle's lower()/regexp agree byte-for-byte).

    Map side is one RE2 split per block buffer + ONE C++ group_by over
    (term, doc) — the exchange then moves O(distinct (term, doc) pairs per
    block), never the token count.  Reduce is a hash exchange on term
    (`grouped_apply(exchange="hash")`, doc as the in-run order column) and
    a fully vectorized per-run scan: reduceat for tf, one ListArray +
    binary_join for the comma-joined posting strings — no per-term Python.

    At 100 TB posting lists of stop-words are unbounded — this operator is
    the exact-index primitive; cap/skip hot terms upstream (`per_key_cap`
    or a df threshold) exactly as production indexes do.
    → Dataset (term, df:int64, tf:int64, postings:string).
    """
    from .canonicalize import grouped_apply

    def pairs(block: pa.Table) -> pa.Table:
        col = block.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, "[^A-Za-z0-9]+")
        flat = pc.ascii_lower(pc.list_flatten(toks))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            block.column(id_col).to_numpy(zero_copy_only=False), lens
        )
        keep = pc.not_equal(flat, "")
        t = pa.table({"term": flat, "doc": pa.array(doc, pa.int64())}).filter(keep)
        # per-(term, doc) tf inside the block; count_all's output name is
        # taken from the RESULT schema, not assumed positionally (ADVICE)
        g = t.group_by(["term", "doc"]).aggregate([([], "count_all")])
        return g.rename_columns(
            ["tf" if c == "count_all" else c for c in g.column_names]
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")

    out_schema = pa.schema([
        pa.field("term", pa.string()), pa.field("df", pa.int64()),
        pa.field("tf", pa.int64()), pa.field("postings", pa.string()),
    ])

    def build_postings(block: pa.Table, starts: np.ndarray) -> pa.Table:
        block = block.combine_chunks()
        n = block.num_rows
        # cross-block (term, doc) pairs may repeat: collapse runs of equal
        # (run_id, doc) — doc is the order col so equal docs are adjacent
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        doc = block.column("doc").to_numpy(zero_copy_only=False)
        tf = block.column("tf").to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        first[1:] = (doc[1:] != doc[:-1]) | (run_id[1:] != run_id[:-1])
        seg = np.flatnonzero(first)
        tf_d = np.add.reduceat(tf, seg) if n else tf
        doc_d, run_d = doc[seg], run_id[seg]
        starts_d = np.flatnonzero(np.r_[True, run_d[1:] != run_d[:-1]])
        m = len(doc_d)
        df = np.diff(np.r_[starts_d, m])
        tf_sum = np.add.reduceat(tf_d, starts_d) if m else tf_d
        strs = pc.cast(pa.array(doc_d, pa.int64()), pa.string())
        offsets = pa.array(np.r_[starts_d, m].astype(np.int32), pa.int32())
        postings = pc.binary_join(pa.ListArray.from_arrays(offsets, strs), ",")
        terms = block.column("term").take(pa.array(seg[starts_d], pa.int64()))
        return pa.Table.from_arrays(
            [terms, pa.array(df, pa.int64()), pa.array(tf_sum, pa.int64()),
             postings],
            schema=out_schema,
        )

    return grouped_apply(
        pair_ds, ["term"], None, out_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=build_postings, order_col="doc", exchange="hash",
    )


def hashing_features(
    docs, *, n_features: int = 1024, text_col: str = "text",
    id_col: str = "doc_id", method: str = "md5",
):
    """Hashing-trick featurizer (Weinberger et al. 2009): every token maps
    to ``feature = hash(token) % n_features``; output is the long sparse
    matrix (id, feature, tf) a downstream linear model / clusterer trains
    on.  → Dataset, NO shuffle: a doc never spans blocks, so the per-block
    (id, feature) group count is FINAL — the whole op is one streaming map.

    Tokenization is DuckDB ``string_split(text, ' ')`` semantics (empty
    string → one empty token) so the oracle mirrors bit-for-bit.

    ``method``:
      * ``md5``  — feature = uint64(first 16 hex of md5(token)) mod
        n_features; matches SQL ``CAST(CONCAT('0x', substr(md5(w),1,16))
        AS UBIGINT) % n`` exactly.  hashlib runs per DISTINCT token per
        block (dictionary-encoded), not per occurrence — cost is O(vocab).
      * ``fast`` — vectorized FNV-1a over the token bytes (one numpy pass
        across the block's flattened token buffer, no per-token Python);
        the 100-TB path when SQL parity is not required.

    The reference has no featurizer (its vectors come from the embedding
    service, embedding_provider.py) — this is training-data-pipeline
    surface on top."""
    import ray.data as rd

    ds = docs if isinstance(docs, rd.Dataset) else rd.from_arrow(docs)
    ds = ds.select_columns([id_col, text_col])
    nf = np.uint64(n_features)

    def _md5_feats(tokens: pa.Array) -> np.ndarray:
        enc = tokens.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_feats = np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % n_features
             for t in enc.dictionary.to_pylist()],
            np.int64,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return dict_feats[codes]

    def _fast_feats(tokens: pa.Array) -> np.ndarray:
        # FNV-1a over utf8 bytes, segmented over the flattened buffer
        flat = tokens.cast(pa.large_binary())
        buf = np.frombuffer(
            flat.buffers()[2] or b"", np.uint8
        ).astype(np.uint64)
        offs = np.frombuffer(flat.buffers()[1], np.int64)[
            flat.offset: flat.offset + len(flat) + 1
        ]
        h = np.full(len(flat), np.uint64(0xCBF29CE484222325))
        prime = np.uint64(0x100000001B3)
        maxlen = int((offs[1:] - offs[:-1]).max()) if len(flat) else 0
        starts, ends = offs[:-1], offs[1:]
        for i in range(maxlen):
            m = starts + i < ends
            idx = np.where(m, starts + i, 0)
            h[m] = (h[m] ^ buf[idx][m]) * prime
        return (h % nf).astype(np.int64)

    feats_fn = _md5_feats if method == "md5" else _fast_feats
    out_schema = None  # derived per block; id keeps its input type

    def per_block(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        toks = pc.split_pattern(b.column(text_col), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        ids = b.column(id_col).take(parents)
        feats = feats_fn(flat.combine_chunks()
                         if isinstance(flat, pa.ChunkedArray) else flat)
        t = pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
             pa.array(feats, pa.int64())],
            names=[id_col, "feature"],
        )
        g = t.group_by([id_col, "feature"]).aggregate([([], "count_all")])
        # select by the ACTUAL generated name before renaming (the
        # keys-first layout is an undocumented pyarrow contract)
        return g.select([id_col, "feature", "count_all"]).rename_columns(
            [id_col, "feature", "tf"]
        )

    return ds.map_batches(per_block, batch_format="pyarrow")
