"""Dedup (exact, MinHash+LSH, SimHash) and similarity-search operators."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.dedup import (
    add_simhash,
    exact_dedup,
    exact_dedup_groups,
    hamming64,
    jaccard_estimate,
    minhash_lsh_components,
    minhash_signature,
    simhash64,
)
from knowledgegraph_ray.stages.knn import (
    allpairs_cosine_threshold,
    ivf_assign,
    ivf_search,
    seeded_centroids,
    topk_cosine,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly "
    "on the quiet village roofs and the river keeps moving toward the sea"
)


def _docs_ds(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    )


def test_exact_dedup_groups_and_keeper():
    texts = [BASE, "unique one", BASE, "unique two", BASE]
    groups = {r["fingerprint"]: r for r in exact_dedup_groups(_docs_ds(texts)).take_all()}
    assert len(groups) == 3
    dup = next(r for r in groups.values() if r["n_dups"] == 3)
    assert dup["keep_id"] == 0  # min id wins
    kept = exact_dedup(_docs_ds(texts)).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 3]


def test_minhash_identical_and_disjoint():
    a = minhash_signature(BASE)
    b = minhash_signature(BASE)
    assert (a == b).all()
    c = minhash_signature("completely different words about spacecraft telemetry systems")
    assert jaccard_estimate(a, c) < 0.2
    assert jaccard_estimate(a, b) == 1.0


def test_minhash_near_duplicate_estimate():
    edited = BASE.replace("quick", "swift")
    est = jaccard_estimate(minhash_signature(BASE), minhash_signature(edited))
    assert 0.5 < est < 1.0


def test_minhash_lsh_clusters_near_dups():
    texts = [
        BASE,
        BASE.replace("quick", "swift"),          # near-dup of 0
        BASE + " extra trailing sentence here",  # near-dup of 0
        "totally unrelated content about orbital mechanics and fuel budgets",
        "another document on medieval trade routes and salt taxation policy",
    ]
    comp = {r["mid"]: r["comp"] for r in minhash_lsh_components(_docs_ds(texts)).take_all()}
    assert comp[0] == comp.get(1, -1) == comp.get(2, -2), comp
    assert comp.get(3) != comp[0] and comp.get(4) != comp[0]


def test_simhash_near_vs_far():
    h0 = simhash64(BASE)
    h1 = simhash64(BASE.replace("quick", "swift"))
    h2 = simhash64("completely different words about spacecraft telemetry systems")
    assert hamming64(h0, h1) < 12
    assert hamming64(h0, h2) > 20
    assert simhash64(BASE) == h0  # deterministic


def test_add_simhash_column():
    out = add_simhash(pa.table({"text": [BASE, ""]}))
    assert out.column("simhash").to_pylist()[1] == 0


@pytest.fixture(scope="module")
def vec_ds():
    rng = np.random.default_rng(123)
    E = rng.standard_normal((200, 16)).astype(np.float32)
    return (
        rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array([row.tolist() for row in E], pa.list_(pa.float32())),
                }
            )
        ),
        E.astype(np.float64),
    )


def test_topk_cosine_matches_numpy_oracle(vec_ds):
    ds, E = vec_ds
    q = np.sin(np.arange(16) + 1.0)
    got = topk_cosine(ds, q, k=5).take_all()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ (q / np.linalg.norm(q))
    order = sorted(range(200), key=lambda i: (-np.floor(cos[i] * 1e4) / 1e4, i))[:5]
    assert [r["vec_id"] for r in got] == order
    for r in got:
        assert r["cos_r"] == np.floor(cos[r["vec_id"]] * 1e4) / 1e4


def test_allpairs_threshold_matches_numpy(vec_ds):
    ds, E = vec_ds
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ En.T
    thr = 0.55
    expected = {
        (i, j) for i in range(200) for j in range(i + 1, 200) if sims[i, j] >= thr
    }
    assert expected, "threshold too high for fixture"
    got = {(r["id_a"], r["id_b"]) for r in allpairs_cosine_threshold(ds, threshold=thr).take_all()}
    assert got == expected


def test_ivf_assign_partitions_and_search_recall(vec_ds):
    ds, E = vec_ds
    cents = seeded_centroids(16, 4)
    assigned = ivf_assign(ds, cents).materialize()
    parts = {r["centroid"] for r in assigned.take_all()}
    assert parts <= {0, 1, 2, 3} and len(parts) > 1
    q = np.sin(np.arange(16) + 1.0)
    exact = [r["vec_id"] for r in topk_cosine(ds, q, k=10).take_all()]
    approx = [r["vec_id"] for r in ivf_search(assigned, cents, q, k=10, n_probe=4).take_all()]
    assert approx == exact  # n_probe = all centroids → exact
    approx2 = [r["vec_id"] for r in ivf_search(assigned, cents, q, k=10, n_probe=2).take_all()]
    assert len(set(approx2) & set(exact)) >= 5  # decent recall at half probes


# ---------------------------------------------------------------------------
# LSH near-dup (scale path) + persisted IVF index
# ---------------------------------------------------------------------------


def _clustered_vecs(n=300, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    E = rng.standard_normal((n, dim))
    for i in range(0, 40, 2):  # inject near-dup pairs
        E[i + 1] = E[i] + 0.05 * rng.standard_normal(dim)
    return E


def _vec_ds(E):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(E)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in E], pa.list_(pa.float64())),
        }
    )
    return rd.from_arrow(tbl).repartition(4)


def test_allpairs_block_tasks_match_numpy_oracle():
    E = _clustered_vecs()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ En.T
    thr = 0.8
    n = len(E)
    oracle = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= thr}
    rows = allpairs_cosine_threshold(_vec_ds(E), threshold=thr, target_block_rows=80).take_all()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == oracle
    assert len(rows) == len(got)  # no duplicate pairs across block tasks


def test_neardup_lsh_subset_of_exact_with_high_recall():
    from knowledgegraph_ray.stages.knn import neardup_pairs_lsh

    E = _clustered_vecs()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ En.T
    thr = 0.8
    n = len(E)
    oracle = {(i, j) for i in range(n) for j in range(i + 1, n) if sims[i, j] >= thr}
    got = {(r["id_a"], r["id_b"])
           for r in neardup_pairs_lsh(_vec_ds(E), threshold=thr).take_all()}
    assert got <= oracle  # exact verify → no false positives
    assert len(got & oracle) >= 0.9 * len(oracle)  # high recall on near-dups


def test_ivf_persisted_index_prunes_and_full_probe_is_exact(tmp_path):
    from knowledgegraph_ray.stages.knn import (
        ivf_build_index,
        ivf_query_index,
        seeded_centroids,
    )
    import os

    E = _clustered_vecs(n=200)
    ds = _vec_ds(E)
    cents = seeded_centroids(16, 4)
    idx_dir = str(tmp_path / "ivf")
    ivf_build_index(ds, cents, idx_dir)
    parts = sorted(d for d in os.listdir(idx_dir) if d.startswith("centroid="))
    assert len(parts) >= 2  # layout is partitioned → probes prune directories

    rng = np.random.default_rng(9)
    q = rng.standard_normal(16)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ (q / np.linalg.norm(q))
    exact = [int(i) for i in np.lexsort((np.arange(len(E)), -cos))[:5]]
    got = [r["vec_id"] for r in
           ivf_query_index(idx_dir, cents, q, k=5, n_probe=4).take_all()]
    assert got == exact  # probing ALL partitions == brute force
    approx = [r["vec_id"] for r in
              ivf_query_index(idx_dir, cents, q, k=5, n_probe=1).take_all()]
    assert len(approx) == 5  # single-partition probe still returns k


def test_ngram_jaccard_join_matches_bruteforce(ray_session):
    """Prefix-filter join == brute-force O(n^2) Jaccard over shingle-hash
    sets, including exact duplicates, near-dups, and unrelated docs."""
    from knowledgegraph_ray.stages.dedup import (
        _shingle_hashes,
        ngram_jaccard_join,
    )

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "in spain falls mainly on the plain and the band plays on")
    texts = [
        base,
        base,                                   # exact dup of 0
        base.replace("quick", "swift"),         # near dup
        base.replace("the", "a"),               # moderate
        "completely different content about graph engines and ray data " * 2,
        "another unrelated document concerning parquet files and arrow " * 2,
        base + " extra tail words appended here",  # near dup, longer
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_r"]
        for r in ngram_jaccard_join(ds, threshold=t, k=5).take_all()
    }
    sets = [set(_shingle_hashes(x, 5).tolist()) for x in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= t:
                want[(i, j)] = np.floor(jac * 10000.0) / 10000.0
    assert set(got) == set(want)
    for k2 in want:
        assert abs(got[k2] - want[k2]) < 1e-12
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_kmeans_recovers_separated_blobs(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.knn import kmeans_assign_counts, kmeans_fit

    rng = np.random.default_rng(11)
    dim = 8
    blobs = [np.array([10.0, 0, 0, 0, 0, 0, 0, 0]),
             np.array([0, 10.0, 0, 0, 0, 0, 0, 0]),
             np.array([0, 0, 10.0, 0, 0, 0, 0, 0])]
    sizes = [60, 40, 20]
    vecs = np.concatenate(
        [c + 0.1 * rng.standard_normal((s, dim)) for c, s in zip(blobs, sizes)]
    )
    flat = pa.array(vecs.reshape(-1), pa.float64())
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    C = kmeans_fit(ds, k=3, iters=8, seed=3)
    counts = sorted(
        r["n_vecs"] for r in kmeans_assign_counts(ds, C).take_all()
    )
    assert counts == sorted(sizes)
    # each blob mean is recovered within the noise scale
    for c in blobs:
        assert np.min(np.linalg.norm(C - c, axis=1)) < 0.5
    # deterministic across partitionings
    C2 = kmeans_fit(rd.from_arrow(tbl).repartition(2), k=3, iters=8, seed=3)
    assert np.allclose(np.sort(C.ravel()), np.sort(C2.ravel()))
    # distributed regime (forced) equals the small-data driver regime at
    # the same allclose bar
    C3 = kmeans_fit(ds, k=3, iters=8, seed=3, small_data_rows=0)
    assert np.allclose(np.sort(C.ravel()), np.sort(C3.ravel()))


def test_ngram_jaccard_exact_boundary_pair(ray_session):
    """jaccard == threshold exactly (4 shared / 5 union = 0.8): the pair MUST
    appear — guards the epsilon on the ceil-based prefix/positional bounds
    (float 0.8 sits slightly above 4/5)."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import ngram_jaccard_join

    tbl = pa.table({"doc_id": [0, 1], "text": ["abcdefgh", "abcdefghi"]})
    rows = ngram_jaccard_join(
        rd.from_arrow(tbl), threshold=0.8, k=5, num_partitions=2
    ).take_all()
    assert [(r["id_a"], r["id_b"], r["jaccard_r"]) for r in rows] == [(0, 1, 0.8)]

    # the SIZE-filter boundary too: |A|=67 ⊂ |B|=125, J = 67/125 = 0.536
    # exactly, where fl(67/0.536) = 124.999… — without the epsilon the
    # size window excludes B and the pair silently vanishes
    import numpy as np
    rng = np.random.default_rng(99)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    while True:
        big = "".join(rng.choice(alpha, 129))
        shingles = {big[i:i + 5] for i in range(125)}
        if len(shingles) == 125:
            break
    small = big[:71]  # 67 shingles, all ⊂ big's
    tbl2 = pa.table({"doc_id": [0, 1], "text": [small, big]})
    rows2 = ngram_jaccard_join(
        rd.from_arrow(tbl2), threshold=0.536, k=5, num_partitions=2
    ).take_all()
    assert [(r["id_a"], r["id_b"]) for r in rows2] == [(0, 1)]
    assert abs(rows2[0]["jaccard_r"] - 67 / 125) < 1e-9


def test_ngram_jaccard_property_random_corpora(ray_session):
    """Property check: the prefix+positional-filtered join equals the O(n²)
    set reference on random low-alphabet corpora (the hot-shingle regime)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import ngram_jaccard_join

    rng = np.random.default_rng(0xC0FFEE)
    for trial in range(6):
        n_docs = int(rng.integers(4, 10))
        texts = [
            "".join(rng.choice(list("abc"), size=int(rng.integers(5, 18))))
            for _ in range(n_docs)
        ]
        thr = float(rng.choice([0.3, 0.5, 0.8]))
        tbl = pa.table({"doc_id": list(range(n_docs)), "text": texts})
        got = sorted(
            (r["id_a"], r["id_b"], r["jaccard_r"])
            for r in ngram_jaccard_join(
                rd.from_arrow(tbl), threshold=thr, k=5, num_partitions=2
            ).take_all()
        )
        # brute-force reference over exact shingle sets
        sets = [
            {t[i:i + 5] for i in range(len(t) - 4)} for t in texts
        ]
        want = []
        for i in range(n_docs):
            for j in range(i + 1, n_docs):
                if not sets[i] or not sets[j]:
                    continue
                inter = len(sets[i] & sets[j])
                jac = inter / (len(sets[i]) + len(sets[j]) - inter)
                if jac >= thr:
                    want.append((i, j, np.floor(jac * 10000.0) / 10000.0))
        assert got == sorted(want), (trial, thr, texts)


def test_ngram_jaccard_shuffle_verify_path_matches(ray_session, monkeypatch):
    """Force the past-broadcast-cap SHUFFLE verify path (join back to the
    shingle lists + vectorized segmented intersection) and check it produces
    the identical pair set as brute force."""
    import knowledgegraph_ray.stages.dedup as dedup_mod
    from knowledgegraph_ray.stages.dedup import _shingle_hashes

    monkeypatch.setattr(dedup_mod, "NGRAM_BROADCAST_BYTES", 0)

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "in spain falls mainly on the plain and the band plays on")
    texts = [
        base,
        base,
        base.replace("quick", "swift"),
        "completely different content about graph engines and ray data " * 2,
        base + " extra tail words appended here",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_r"]
        for r in dedup_mod.ngram_jaccard_join(ds, threshold=t, k=5).take_all()
    }
    sets = [set(_shingle_hashes(x, 5).tolist()) for x in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= t:
                want[(i, j)] = np.floor(jac * 10000.0) / 10000.0
    assert set(got) == set(want)
    for k2 in want:
        assert abs(got[k2] - want[k2]) < 1e-12


def test_ivf_efs_recall_knob(vec_ds):
    """HNSW-parity efs knob (reference query_search.py:74-78 uses efs=200):
    recall@k is non-decreasing in efs, exact once efs covers the corpus, and
    the sweep reports the scanned fraction honestly."""
    from knowledgegraph_ray.stages.knn import (
        ivf_assign,
        ivf_recall_sweep,
        ivf_search,
        seeded_centroids,
    )

    ds, E = vec_ds
    cents = seeded_centroids(16, 8)
    assigned = ivf_assign(ds, cents).materialize()
    rng = np.random.default_rng(3)
    queries = [rng.standard_normal(16) for _ in range(4)]
    tbl = ivf_recall_sweep(
        assigned, cents, queries, k=10, efs_values=(20, 60, 200, 400)
    )
    rec = tbl.column("recall_at_k").to_pylist()
    frac = tbl.column("frac_scanned").to_pylist()
    assert all(b >= a - 1e-9 for a, b in zip(rec, rec[1:])), rec
    assert rec[-1] == 1.0          # efs >= corpus ⇒ exact (200 vectors)
    assert frac[-1] == 1.0
    assert frac[0] < 0.75          # small efs really prunes
    # efs kwarg on ivf_search matches the sweep's probe sizing
    got = {r["vec_id"] for r in ivf_search(
        assigned, cents, queries[0], k=10, efs=400).take_all()}
    from knowledgegraph_ray.stages.knn import topk_cosine
    want = {r["vec_id"] for r in topk_cosine(ds, queries[0], k=10).take_all()}
    assert got == want


def test_per_key_cap_matches_row_number_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import per_key_cap

    rng = np.random.default_rng(3)
    n = 20_000
    # one hot key (half the rows) + a long tail — the CC hub-domain shape
    keys = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 2_000, n))
    ids = rng.permutation(n).astype(np.int64)
    t = pa.Table.from_pydict(
        {"k": pa.array([f"dom-{k}" for k in keys]), "doc_id": pa.array(ids)}
    )
    expected = set()
    by_key: dict = {}
    for k, i in zip(keys, ids):
        by_key.setdefault(k, []).append(i)
    for k, lst in by_key.items():
        expected.update((k, i) for i in sorted(lst)[:7])

    for parts in (1, 5, 16):
        ds = rd.from_arrow(t).repartition(parts)
        out = per_key_cap(ds, key_cols=["k"], order_col="doc_id", n=7).take_all()
        got = {(int(r["k"].split("-")[1]), r["doc_id"]) for r in out}
        assert got == expected, f"parts={parts}"


def test_contamination_hits_known_overlaps(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import contamination_hits

    bench = "the quick brown fox jumps over the lazy dog"
    probe = rd.from_arrow(
        pa.Table.from_pydict({"doc_id": pa.array([0], pa.int64()),
                              "text": pa.array([bench])})
    )
    corpus = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": pa.array(
                    [
                        "xxxx quick brown fox yyyy",   # shares 13-grams
                        "completely unrelated words here none overlap",
                        bench,                          # verbatim copy
                        "tiny",                         # shorter than k
                    ]
                ),
            }
        )
    ).repartition(3)
    out = {r["doc_id"]: r["n_hits"] for r in
           contamination_hits(corpus, probe, k=13).take_all()}
    assert 10 in out and out[10] >= 1
    assert 12 in out and out[12] == len(bench) - 12  # all distinct 13-grams hit
    assert 11 not in out and 13 not in out


def test_passage_dedup_stats_edge_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import passage_dedup_stats

    w = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    # doc 0: 2 full passages (40 words), all unique
    # doc 1: exact copy of doc 0 -> every passage duplicates doc 0 -> kept 0
    # doc 2: short doc (7 words < W) -> 1 passage, unique
    # doc 3: first 20 words copy doc 0's first passage, next 20 unique
    # doc 4: 21 words -> 2 passages (20 + 1-word tail), both unique
    docs = [
        (0, w(40, "a")),
        (1, w(40, "a")),
        (2, w(7, "b")),
        (3, " ".join(f"a{i}" for i in range(20)) + " " + w(20, "c")),
        (4, w(21, "d")),
    ]
    t = pa.Table.from_pydict(
        {"doc_id": pa.array([d for d, _ in docs], pa.int64()),
         "text": pa.array([s for _, s in docs])}
    )
    for parts in (1, 3):
        ds = rd.from_arrow(t).repartition(parts)
        out = {r["doc_id"]: (r["total_passages"], r["kept_passages"])
               for r in passage_dedup_stats(ds).take_all()}
        assert out == {
            0: (2, 2),
            1: (2, 0),   # fully-duplicate doc: left-join fill path
            2: (1, 1),
            3: (2, 1),
            4: (2, 2),
        }, f"parts={parts}"


def test_dedup_keep_best_representatives(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import dedup_keep_best
    from knowledgegraph_ray.stages.textops import add_quality_score

    # two near-dup families (long shared prefix, tiny suffix edits) with
    # different punctuation density -> different quality scores; plus
    # unrelated singleton docs
    base_a = "the quick brown fox jumps over the lazy dog " * 20
    base_b = "pack my box with five dozen liquor jugs now " * 20
    docs = [
        (0, base_a + "alpha end."),
        (1, base_a + "alpha end!!!! ;;;; ::: ,,,,"),   # worse quality (punct)
        (2, base_a + "alpha ending here."),
        (10, base_b + "beta."),
        (11, base_b + "beta!!!! ,,,, ;;;;"),
        (50, "completely unrelated text about distributed query engines"),
        (51, "another standalone document with no near duplicates at all"),
    ]
    t = pa.Table.from_pydict(
        {"doc_id": pa.array([d for d, _ in docs], pa.int64()),
         "text": pa.array([s for _, s in docs])}
    )
    ds = rd.from_arrow(t).repartition(2)
    reps = dedup_keep_best(ds, num_partitions=4).take_all()
    by_cluster = {r["cluster"]: r["doc_id"] for r in reps}

    # quality ground truth per doc (same kernel the operator uses)
    q = {r["doc_id"]: r["quality_score"]
         for r in add_quality_score(t).to_pylist()}

    # family A (cluster rooted at min id 0) and family B (min id 10) must
    # each keep exactly their highest-quality member
    assert 0 in by_cluster and 10 in by_cluster
    fam_a = [0, 1, 2]
    best_a = max(fam_a, key=lambda d: (q[d], -d))
    assert by_cluster[0] == best_a
    fam_b = [10, 11]
    best_b = max(fam_b, key=lambda d: (q[d], -d))
    assert by_cluster[10] == best_b
    # singletons keep themselves
    assert by_cluster.get(50) == 50 and by_cluster.get(51) == 51
    # exactly one representative per cluster, reps are real doc ids
    assert len(reps) == len(by_cluster)
    assert {r["doc_id"] for r in reps} <= {d for d, _ in docs}


def test_cross_neardup_matches_bruteforce(ray_session):
    """cross_neardup (broadcast bench matmul) vs numpy brute force:
    planted near-dups across the split, threshold boundary, floor4
    parity, partition invariance."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.knn import cross_neardup, floor4

    rng = np.random.default_rng(13)
    dim, nc, nb = 16, 60, 8
    C = rng.normal(size=(nc, dim))
    B = rng.normal(size=(nb, dim))
    B[2] = C[10] + 0.01 * rng.normal(size=dim)  # planted cross near-dup
    B[5] = C[41]                                # exact cross duplicate

    def tbl(M, ids):
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.reshape(-1), pa.float64()), dim
            ),
        })

    corpus = tbl(C, range(nc))
    bench = tbl(B, range(1000, 1000 + nb))

    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    sims = Cn @ Bn.T
    thr = 0.9
    want = {(i, 1000 + j, floor4(np.array([sims[i, j]]))[0])
            for i, j in zip(*np.nonzero(sims >= thr))}
    assert len(want) >= 2  # both plants found

    for parts in (1, 5):
        got = {(r["id_a"], r["id_b"], r["cos_r"]) for r in cross_neardup(
            rd.from_arrow(corpus).repartition(parts), bench, threshold=thr
        ).take_all()}
        assert got == want, parts


def test_ngram_containment_matches_brute():
    """Property: exact ordered-pair containment vs brute-force shingle sets,
    including a short doc embedded verbatim in a long one (the asymmetric
    case Jaccard misses)."""
    import numpy as np

    from knowledgegraph_ray.stages.dedup import ngram_containment_join

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    quote = "the quick brown fox jumps over the lazy dog"
    texts = []
    for i in range(40):
        body = " ".join(rng.choice(words, size=rng.integers(8, 30)))
        if i % 7 == 0:
            body = body + " " + quote + " " + body[::-1]
        texts.append(body)
    texts.append(quote)                      # doc 40: contained in every i%7==0
    texts.append(quote + " extra tail")      # doc 41: mostly contained
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["containment_r"]
        for r in ngram_containment_join(ds, threshold=t, k=5).take_all()
    }

    def shingles(s):
        return {s[i:i + 5] for i in range(len(s) - 4)}

    sets = [shingles(s) for s in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b or not sets[a]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= t:
                want[(a, b)] = np.floor(c * 10000.0) / 10000.0
    assert got == want
    assert any(a == 40 for a, _ in got), "the quote doc must be contained somewhere"
    # asymmetry: the long host is NOT contained in the short quote
    host = next(b for a, b in got if a == 40)
    assert (host, 40) not in got


def test_edit_distance_pairs_exact_vs_bruteforce(ray_session):
    """FastSS blocking + banded verify is EXACT: random words with planted
    substitutions, insertions, deletions and transposition-like edits, vs a
    brute-force full-DP all-pairs oracle."""
    import itertools
    import random

    import ray.data as rd

    from knowledgegraph_ray.stages.dedup import (
        edit_distance_pairs,
        levenshtein_bounded,
    )

    def full_dp(a, b):
        la, lb = len(a), len(b)
        d = list(range(la + 1))
        for j in range(1, lb + 1):
            prev, d[0] = d[0], j
            for i in range(1, la + 1):
                cur = d[i]
                d[i] = prev if a[i - 1] == b[j - 1] else 1 + min(prev, d[i], d[i - 1])
                prev = cur
        return d[la]

    rng = random.Random(77)
    alpha = "abcdefg"
    base = ["".join(rng.choices(alpha, k=rng.randint(3, 12))) for _ in range(60)]
    words = list(base)
    for w in base[:30]:  # planted near neighbors of every edit kind
        i = rng.randrange(len(w))
        words.append(w[:i] + rng.choice(alpha) + w[i:])          # insertion
        if len(w) > 3:
            words.append(w[:i] + w[i + 1:])                       # deletion
        words.append(w[:i] + rng.choice(alpha) + w[i + 1:])       # substitution
        if len(w) > 4 and i < len(w) - 1:
            words.append(w[:i] + w[i + 1] + w[i] + w[i + 2:])     # transposition
    ds = rd.from_items(
        [{"id": n, "s": w} for n, w in enumerate(words)]
    ).repartition(5)
    for k in (1, 2):
        got = sorted(
            (r["a"], r["b"], r["dist"])
            for r in edit_distance_pairs(
                ds, id_col="id", text_col="s", max_dist=k, num_partitions=4
            ).take_all()
        )
        want = sorted(
            (i, j, full_dp(words[i], words[j]))
            for i, j in itertools.combinations(range(len(words)), 2)
            if full_dp(words[i], words[j]) <= k
        )
        assert got == want, f"k={k}: {len(got)} vs {len(want)} pairs"
    # the banded kernel agrees with full DP and clamps above the bound
    for a, b in itertools.combinations(words[:25], 2):
        d = full_dp(a, b)
        for k in (1, 2, 3):
            assert levenshtein_bounded(a, b, k) == (d if d <= k else k + 1)
