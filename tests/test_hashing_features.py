"""Hashing-trick featurizer: md5 path vs a brute-force Python reference
(and the SQL hash convention), fast path properties, partition invariance,
string_split token semantics."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


def _ref(rows, n_features):
    out = {}
    for doc_id, text in rows:
        for w in text.split(" "):
            f = int(hashlib.md5(w.encode()).hexdigest()[:16], 16) % n_features
            out[(doc_id, f)] = out.get((doc_id, f), 0) + 1
    return out


def test_hashing_features_md5_matches_reference(ray_session):
    from knowledgegraph_ray.stages.textops import hashing_features

    rows = [
        (0, "the cat sat on the mat"),
        (1, "a b a b a"),
        (2, ""),                      # string_split('') -> one empty token
        (3, "double  space"),         # empty token between the spaces
    ]
    want = _ref(rows, 64)
    tbl = pa.table({"doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows]})
    for parts in (1, 3):
        got = hashing_features(
            rd.from_arrow(tbl).repartition(parts), n_features=64
        ).to_pandas()
        gm = {(r.doc_id, r.feature): r.tf
              for r in got.itertuples(index=False)}
        assert gm == want, parts
    # Σtf per doc == token count (split semantics: len+1 spaces)
    g = hashing_features(rd.from_arrow(tbl), n_features=64).to_pandas()
    sums = g.groupby("doc_id")["tf"].sum().to_dict()
    assert sums == {0: 6, 1: 5, 2: 1, 3: 3}


def test_hashing_features_fast_path_properties(ray_session):
    from knowledgegraph_ray.stages.textops import hashing_features

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(40)]
    tbl = pa.table({"doc_id": list(range(40)), "text": texts})
    a = hashing_features(
        rd.from_arrow(tbl), n_features=256, method="fast"
    ).to_pandas().sort_values(["doc_id", "feature"]).reset_index(drop=True)
    b = hashing_features(
        rd.from_arrow(tbl).repartition(4), n_features=256, method="fast"
    ).to_pandas().sort_values(["doc_id", "feature"]).reset_index(drop=True)
    assert a.equals(b)
    assert a["feature"].between(0, 255).all()
    # same token -> same feature everywhere; Σtf == token totals
    sums = a.groupby("doc_id")["tf"].sum().tolist()
    assert sums == [len(t.split(" ")) for t in texts]
    # FNV-1a reference spot check
    def fnv(w):
        h = 0xCBF29CE484222325
        for byte in w.encode():
            h = ((h ^ byte) * 0x100000001B3) % 2**64
        return h % 256
    one = hashing_features(
        rd.from_arrow(pa.table({"doc_id": [0], "text": ["hello"]})),
        n_features=256, method="fast",
    ).to_pandas()
    assert one.iloc[0]["feature"] == fnv("hello")
