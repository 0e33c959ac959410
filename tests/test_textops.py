"""Behavioral unit tests for text-analysis operators whose sf-corpus oracle
parity is trivially satisfied (the synthetic corpus has no PII / symbols):
the regex/kernel semantics are exercised on constructed text here."""

import pyarrow as pa

from knowledgegraph_ray.stages.textops import (
    add_gopher_flags,
    add_pii_masked,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_pii_mask_emails_and_phones():
    out = add_pii_masked(
        _tbl(
            [
                "contact alice.smith+spam@example-corp.co.uk today",
                "call +1 (555) 123-4567 or 555-867-5309 now",
                "mixed bob@x.io and 0171-234 5678 in one line",
                "nothing sensitive here",
                "",
            ]
        )
    )
    assert out.column("n_emails").to_pylist() == [1, 0, 1, 0, 0]
    assert out.column("n_phones").to_pylist() == [0, 2, 1, 0, 0]
    masked = out.column("masked_text").to_pylist()
    assert masked[0] == "contact <EMAIL> today"
    assert masked[1] == "call <PHONE> or <PHONE> now"
    assert masked[2] == "mixed <EMAIL> and <PHONE> in one line"
    assert masked[3] == "nothing sensitive here"
    assert masked[4] == ""


def test_pii_mask_email_then_phone_order():
    # the email is masked first, so its digits never feed the phone regex
    out = add_pii_masked(_tbl(["mail 12345678901@numbers-domain.com end"]))
    assert out.column("n_emails").to_pylist() == [1]
    assert out.column("n_phones").to_pylist() == [0]
    assert out.column("masked_text").to_pylist() == ["mail <EMAIL> end"]


def test_gopher_flags_gates():
    long_good = " ".join(["token"] * 60)  # 60 tokens, mwl=5.0
    too_short = "just a few words here"  # < 50 tokens
    symbol_heavy = " ".join(["###"] * 60)  # symbol_ratio = 3.0
    long_words = " ".join(["extraordinarily"] * 60)  # mwl = 15 > 10
    out = add_gopher_flags(_tbl([long_good, too_short, symbol_heavy, long_words]))
    assert out.column("gopher_keep").to_pylist() == [True, False, False, False]
    mwl = out.column("mean_word_len").to_pylist()
    assert mwl[0] == 5.0
    assert mwl[3] == 15.0
    sym = out.column("symbol_ratio").to_pylist()
    assert sym[0] == 0.0
    assert sym[2] == 3.0


def test_gopher_symbol_ratio_counts_ellipsis():
    out = add_gopher_flags(_tbl(["wait... what... # done"]))
    # 2 "..." + 1 "#" over 4 tokens = 0.75
    assert out.column("symbol_ratio").to_pylist() == [0.75]


def test_top_terms_tokenization_and_order(ray_session):
    import ray.data as rd

    from knowledgegraph_ray.stages.textops import top_terms

    ds = rd.from_arrow(_tbl([
        "The cat, the CAT--and a dog!",
        "cat 42 dog dog",
        "",
    ]))
    got = top_terms(ds, k=3).to_pandas()
    # counts: the=2+... "The"/"the"/"CAT"/"cat" ASCII-lower; punctuation splits
    assert list(got["term"]) == ["cat", "dog", "the"]
    assert list(got["cnt"]) == [3, 3, 2]  # cat/dog tie broken by term ascending


def test_top_terms_sketch_exact_under_truncation(ray_session):
    import ray.data as rd

    from knowledgegraph_ray.stages.textops import top_terms, top_terms_sketch

    # Zipf-ish: every doc carries all 7 head terms + one unique singleton.
    # capacity 8 keeps the heads and truncates the uniques in every block
    # (threshold 1), so the certified sketch path (truncate → prune →
    # recount) is genuinely exercised, not the distinct<=capacity fast path.
    texts = [
        " ".join(f"t{j}" for j in range(7)) + f" u{i:04d}" for i in range(300)
    ]
    ds = rd.from_arrow(_tbl(texts)).repartition(5)
    exact = top_terms(ds, k=5).to_pandas()
    got = top_terms_sketch(ds, k=5, capacity_per_block=8).to_pandas()
    assert list(got["term"]) == list(exact["term"]) == [f"t{j}" for j in range(5)]
    assert list(got["cnt"]) == list(exact["cnt"]) == [300] * 5


def test_top_terms_sketch_flat_distribution_falls_back_exact(ray_session):
    import ray.data as rd

    from knowledgegraph_ray.stages.textops import top_terms, top_terms_sketch

    # Flat-ish counts with aggressive truncation: the threshold mass reaches
    # the k-th lower bound, the sketch cannot certify absent terms, and the
    # operator must return the exact result via the fallback path.
    texts = [f"t{i % 7} t{i % 7} u{i:04d}" for i in range(300)]
    ds = rd.from_arrow(_tbl(texts)).repartition(5)
    exact = top_terms(ds, k=5).to_pandas()
    got = top_terms_sketch(ds, k=5, capacity_per_block=3).to_pandas()
    assert list(got["term"]) == list(exact["term"])
    assert list(got["cnt"]) == list(exact["cnt"])


def test_rolling_fingerprint_properties():
    """Pytest oracle for q_rolling_fp (PYTEST_ORACLES): the fingerprint is a
    winnowing selector — deterministic, batch==scalar, and for any text of at
    least one window the value is the fingerprint of ONE of its 8-byte
    windows (min-selection membership)."""
    from knowledgegraph_ray.stages.textops import (
        add_rolling_fingerprint,
        rolling_fingerprint,
    )

    texts = ["", "abc", "exactly8", "the quick brown fox jumps", "aaaaaaaaaa",
             "Übergrößenträger unicode ✓ content"]
    # determinism + empty semantics
    assert rolling_fingerprint("") == 0
    for t in texts:
        assert rolling_fingerprint(t) == rolling_fingerprint(t)
    # batch kernel == scalar kernel
    out = add_rolling_fingerprint(_tbl(texts))
    assert out.column("roll_fp").to_pylist() == [rolling_fingerprint(t) for t in texts]
    # min-selection membership: fp(text) is the fp of one of its windows
    long = "the quick brown fox jumps over the lazy dog"
    b = long.encode("utf-8")
    window_fps = {rolling_fingerprint(b[i:i + 8].decode("latin-1"))
                  for i in range(len(b) - 7)
                  if len(b[i:i + 8].decode("latin-1").encode("utf-8")) == 8}
    assert rolling_fingerprint(long) in window_fps


def test_explode_sentences_matches_duckdb_re2(ray_session):
    """Multi-sentence prose (the synthetic corpus has no terminators, so the
    driver oracle only checks 1-sentence plumbing — this covers the real
    splits): multiple terminators, !?! runs, trailing whitespace producing a
    kept empty piece, null text, and an empty doc."""
    import duckdb
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.textops import explode_sentences

    texts = [
        "One sentence. Two sentences! Three?? Four... done",
        "No terminator here",
        "Trailing space. ",
        None,
        "",
        "A!B stays one sentence. split only at ws.  double-space ok",
    ]
    tbl = pa.Table.from_pydict({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = (
        rd.from_arrow(tbl).repartition(3)
        .map_batches(explode_sentences, batch_format="pyarrow")
        .take_all()
    )
    got_set = {(r["doc_id"], r["sent_idx"], r["sentence"]) for r in got}
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(r"""
        SELECT doc_id,
               CAST(generate_subscripts(
                 regexp_split_to_array(coalesce(text, ''), '[.!?]+\s+'), 1
               ) AS BIGINT) AS sent_idx,
               unnest(regexp_split_to_array(coalesce(text, ''), '[.!?]+\s+'))
                 AS sentence
        FROM documents
    """).fetchall()
    assert got_set == set(map(tuple, exp))
    # sanity on the semantics themselves, not just engine agreement
    d0 = sorted((r["sent_idx"], r["sentence"]) for r in got if r["doc_id"] == 0)
    assert d0 == [(1, "One sentence"), (2, "Two sentences"), (3, "Three"),
                  (4, "Four"), (5, "done")]


def test_normalize_urls_edge_cases():
    """Pure batch kernel — no Ray needed.  Covers branches the driver
    query's synthetic URLs don't reach: http:80, a non-default port kept,
    non-http(s) scheme ports untouched, unparseable rows passed through,
    null input, multi-slash trailing trim, and a host without www."""
    import pyarrow as pa

    from knowledgegraph_ray.stages.textops import normalize_urls

    urls = [
        "HTTP://Host.COM:80/a/",          # http default port stripped
        "http://host.com:8080/a",         # non-default port kept
        "FTP://WWW.Host.com:443/x",       # ftp: :443 is NOT default -> kept
        "not a url",                      # unparseable -> passthrough
        None,                             # null stays null (SQL regexp chains propagate NULL)
        "https://deep.example.org/a/b///",  # multi-slash trim
        "https://example.org",            # empty path stays empty
    ]
    out = normalize_urls(
        pa.Table.from_pydict({"url": pa.array(urls, pa.string())})
    ).column("url_norm").to_pylist()
    assert out == [
        "http://host.com/a",
        "http://host.com:8080/a",
        "ftp://host.com:443/x",
        "not a url",
        None,
        "https://deep.example.org/a/b",
        "https://example.org",
    ]


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(a) + 1))
    for i, bc in enumerate(b, 1):
        cur = [i]
        for j, ac in enumerate(a, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ac != bc)))
        prev = cur
    return prev[-1]


def test_levenshtein_matches_reference_dp():
    import numpy as np
    import pyarrow as pa

    from knowledgegraph_ray.stages.textops import (
        _levenshtein_to_probe, add_min_levenshtein,
    )

    rng = np.random.default_rng(7)
    alpha = list("abcdü €x")
    strs = ["".join(rng.choice(alpha, rng.integers(0, 12)))
            for _ in range(200)] + ["", "exact probe", None]
    col = pa.array(strs, pa.string())
    for probe in ["", "abc", "exact probe", "dü €"]:
        got = _levenshtein_to_probe(col, probe)
        for s, g in zip(strs, got):
            if s is not None:
                assert g == _lev_ref(s, probe), (s, probe)

    probes = ["abc", "dü €x"]
    out = add_min_levenshtein(
        pa.table({"s_name": col}), probes, out_col="min_lev"
    ).column("min_lev").to_pylist()
    for s, g in zip(strs, out):
        if s is None:
            assert g is None
        else:
            assert g == min(_lev_ref(s, p) for p in probes)


def test_ngram_decontaminate_matches_bruteforce(ray_session):
    """Token-level decontamination vs a literal n-gram set reference:
    planted verbatim overlaps, empty-token (double space) windows, docs
    shorter than n, and partition invariance."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.textops import ngram_decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]

    def doc(n):
        return " ".join(rng.choice(vocab, n))

    bench_texts = [doc(30), doc(25), "a  b " + doc(15)]  # double space kept
    texts = [doc(40) for _ in range(20)]
    # plant: doc 3 copies bench 13-gram once, doc 7 embeds two overlapping
    # copies, doc 11 copies the double-space window, doc 15 is too short
    b0 = bench_texts[0].split(" ")
    texts[3] = doc(5) + " " + " ".join(b0[2:15]) + " " + doc(5)
    texts[7] = " ".join(b0[0:14]) + " " + doc(3)  # 14 tokens = 2 windows
    b2 = bench_texts[2].split(" ")
    texts[11] = " ".join(b2[0:13]) + " " + doc(4)
    texts[15] = "short doc"

    def grams(t, n=13):
        a = t.split(" ")
        return [" ".join(a[i:i + n]) for i in range(len(a) - n + 1)]

    bench_set = {g for t in bench_texts for g in grams(t)}
    want = {}
    for i, t in enumerate(texts):
        h = sum(g in bench_set for g in grams(t))
        if h:
            want[i] = h
    assert {3, 7, 11} <= set(want)

    bench = pa.table({"doc_id": pa.array(range(100, 103), pa.int64()),
                      "text": bench_texts})
    tbl = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                    "text": texts})
    for parts in (1, 6):
        got = {r["doc_id"]: r["n_hits"] for r in ngram_decontaminate(
            rd.from_arrow(tbl).repartition(parts), bench, n=13
        ).take_all()}
        assert got == want, parts


def test_bm25_topk_matches_reference(ray_session):
    """BM25 vs a literal single-process reference (same formula, python
    floats): planted term frequencies, docs with zero matches excluded,
    per-block prune cannot drop a global top-k member, tie broken by id."""
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.textops import bm25_topk

    rng = np.random.default_rng(5)
    filler = [f"x{i}" for i in range(20)]
    terms = ["apple", "banana"]
    texts, n_docs = [], 40
    for i in range(n_docs):
        words = list(rng.choice(filler, rng.integers(5, 30)))
        words += ["apple"] * int(rng.integers(0, 4))
        words += ["banana"] * int(rng.integers(0, 3))
        rng.shuffle(words)
        texts.append(" ".join(words))
    texts[0] = "no match here at all"
    tbl = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                    "text": texts})

    # reference
    toks = [[w.lower() for w in t.split(" ") if w] for t in texts]
    N = n_docs
    avgdl = float(sum(len(t) for t in toks)) / float(N)
    k1, b = 1.2, 0.75
    df = {q: sum(1 for t in toks if q in t) for q in terms}
    idf = {q: math.log(1.0 + (N - df[q] + 0.5) / (df[q] + 0.5))
           for q in terms}
    want = []
    for i, t in enumerate(toks):
        tf = {q: t.count(q) for q in terms}
        if sum(tf.values()) == 0:
            continue
        dl = float(len(t))
        s = 0.0
        for q in terms:
            tff = float(tf[q])
            s = s + idf[q] * (tff * (k1 + 1.0)) / (
                tff + k1 * (1.0 - b + b * dl / avgdl))
        want.append((math.floor(s * 1e4) / 1e4, i))
    want = sorted(want, key=lambda p: (-p[0], p[1]))[:10]
    want = [(i, s) for s, i in want]

    for parts in (1, 7):
        got = bm25_topk(
            rd.from_arrow(tbl).repartition(parts), terms, k=10
        ).to_pylist()
        assert [(r["doc_id"], r["score"]) for r in got] == want, parts


def test_chunk_token_windows_matches_reference(ray_session):
    """Window chunker vs a literal reference: exact window starts/sizes,
    tail truncation, double-space empty tokens, empty text (one empty
    chunk — string_split semantics), partition invariance."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.textops import chunk_token_windows

    texts = [
        " ".join(f"w{i}" for i in range(150)),  # 150 tokens → 5 windows
        "a b",                                   # shorter than one window
        "x  y z",                                # double space: empty token
        "",                                      # 1 empty token, 1 chunk
        " ".join(f"t{i}" for i in range(64)),    # exactly one full window
    ]
    size, stride = 64, 32
    want = set()
    for i, t in enumerate(texts):
        a = t.split(" ")
        k = 0
        while k * stride < len(a):
            want.add((i, k, " ".join(a[k * stride: k * stride + size])))
            k += 1
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    for parts in (1, 4):
        got = {(r["doc_id"], r["chunk_id"], r["chunk"])
               for r in chunk_token_windows(
                   rd.from_arrow(tbl).repartition(parts),
                   size=size, stride=stride).take_all()}
        assert got == want, parts
    # 150 tokens: starts 0,32,64,96,128 → 5 windows, last has 22 tokens
    assert sum(1 for d, k, c in want if d == 0) == 5
    assert len([c for d, k, c in want if d == 0 and k == 4][0].split(" ")) == 22
