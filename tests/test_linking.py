"""Entity-linking candidate stage (stages/linking.py): char-n-gram
embedding, ANN-candidate scoring, alias-dictionary keys, and the
canonicalize(linking=...) integration — the north-star fuzzy capability the
reference's exact-only rules lack."""

import json

import numpy as np
import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.stages.canonicalize import canonicalize
from knowledgegraph_ray.stages.linking import (
    LinkingConfig,
    char_ngram_vectors,
    linking_pairs,
    scored_candidate_pairs,
)


def _mentions_table(rows):
    return pa.Table.from_pydict(
        {
            "mid": [r["mid"] for r in rows],
            "url": [r.get("url", "u") for r in rows],
            "ord": [r.get("ord", r["mid"]) for r in rows],
            "entity_name": [r["name"] for r in rows],
            "entity_type": [r.get("type", "Person") for r in rows],
            "attributes_json": [json.dumps(r.get("attrs", {})) for r in rows],
            "permissions_json": [json.dumps(r.get("perms", [])) for r in rows],
        }
    )


def _cos(a: str, b: str, dim=128) -> float:
    v = char_ngram_vectors(pa.array([a, b], pa.string()), dim=dim)
    return float(v[0] @ v[1])


def test_char_ngram_embedding_properties():
    # deterministic
    v1 = char_ngram_vectors(pa.array(["john smith"]))
    v2 = char_ngram_vectors(pa.array(["john smith"]))
    assert np.array_equal(v1, v2)
    # unit norm
    assert abs(np.linalg.norm(v1[0]) - 1.0) < 1e-6
    # fuzzy variants stay close, unrelated decorrelates
    assert _cos("aleksandr volkov", "alexander volkov") > 0.7
    assert _cos("mueller gmbh", "muller gmbh") > 0.7
    assert _cos("acme corporation", "acme corp") > 0.6
    assert _cos("john smith", "jonh smith") > 0.4   # transposition
    assert _cos("john smith", "parquet file engine") < 0.3
    assert _cos("wayne corp", "stark gmbh") < 0.3
    # batch kernel == per-row kernel (segmentation correctness)
    many = ["alpha beta", "x", "", "gamma delta epsilon", "jonh smith"]
    vb = char_ngram_vectors(pa.array(many), dim=32)
    for i, t in enumerate(many):
        vi = char_ngram_vectors(pa.array([t]), dim=32)[0]
        assert np.allclose(vb[i], vi)


def test_scored_candidates_find_variants_and_respect_type(ray_session):
    rows = [
        {"mid": 0, "name": "Aleksandr Volkov"},
        {"mid": 1, "name": "Alexander Volkov"},          # translit variant
        {"mid": 2, "name": "Mueller GmbH", "type": "Organization"},
        {"mid": 3, "name": "Muller GmbH", "type": "Organization"},  # diacritic
        {"mid": 4, "name": "Ray Data Engine"},           # unrelated
        # same surface as 1 but DIFFERENT type: must never pair
        {"mid": 5, "name": "Alexander Volkov", "type": "Organization"},
    ]
    ds = rd.from_arrow(_mentions_table(rows))
    got = {
        (r["mid_a"], r["mid_b"]): r["cos_r"]
        for r in scored_candidate_pairs(ds, LinkingConfig()).take_all()
    }
    assert (0, 1) in got and (2, 3) in got
    assert all(4 not in p for p in got)
    assert (1, 5) not in got and (0, 5) not in got  # type blocking
    assert all(v >= 0.6 for v in got.values())


def test_canonicalize_linking_merges_what_exact_rules_miss(ray_session):
    rows = [
        {"mid": 0, "name": "Aleksandr Volkov", "attrs": {"name": "Aleksandr Volkov"}},
        {"mid": 1, "name": "Alexander Volkov", "attrs": {"name": "Alexander Volkov"}},
    ]
    ds = rd.from_arrow(_mentions_table(rows))
    # OFF (reference parity): exact keys miss the variant → two nodes
    nodes_off, _ = canonicalize(ds, num_partitions=2)
    assert nodes_off.count() == 2
    # ON: the embedding-ANN candidate links them → one node, the variant
    # surface becomes an alias (first-item-wins base semantics untouched)
    ds2 = rd.from_arrow(_mentions_table(rows))
    nodes_on, with_comp = canonicalize(
        ds2, num_partitions=2, linking=LinkingConfig()
    )
    out = nodes_on.take_all()
    assert len(out) == 1
    assert out[0]["name"] == "Aleksandr Volkov"  # first item is still the base
    assert out[0]["aliases"] == ["Alexander Volkov"]
    comp = {r["mid"]: r["comp"] for r in with_comp.take_all()}
    assert comp[0] == comp[1]


def test_linking_does_not_merge_different_people(ray_session):
    # shared first name is NOT identity: stays two nodes at the default
    # threshold (precision-first)
    rows = [
        {"mid": 0, "name": "John Smith", "attrs": {"name": "John Smith"}},
        {"mid": 1, "name": "John Doe", "attrs": {"name": "John Doe"}},
    ]
    nodes, _ = canonicalize(
        rd.from_arrow(_mentions_table(rows)), num_partitions=2,
        linking=LinkingConfig(),
    )
    assert nodes.count() == 2


def test_alias_dictionary_links_name_to_alias(ray_session):
    rows = [
        {"mid": 0, "name": "Robert Smith III", "attrs": {"name": "Robert Smith III"}},
        # different surface, but its aliases contain mention 0's exact name
        {"mid": 1, "name": "Bob Smith", "attrs": {"name": "Bob Smith",
                                                  "aliases": ["Robert Smith III"]}},
    ]
    # surfaces are dissimilar (cosine below threshold) — only the alias
    # dictionary can link them
    assert _cos("robert smith iii", "bob smith") < 0.6
    ds = rd.from_arrow(_mentions_table(rows))
    nodes_off, _ = canonicalize(ds, num_partitions=2)
    assert nodes_off.count() == 2
    ds2 = rd.from_arrow(_mentions_table(rows))
    nodes_on, _ = canonicalize(
        ds2, num_partitions=2, linking=LinkingConfig(alias_dictionary=True),
    )
    assert nodes_on.count() == 1


def test_linking_pairs_schema_matches_cc(ray_session):
    ds = rd.from_arrow(_mentions_table([
        {"mid": 0, "name": "Aleksandr Volkov"},
        {"mid": 1, "name": "Alexander Volkov"},
    ]))
    pairs = linking_pairs(ds, LinkingConfig()).take_all()
    assert pairs, "variant pair must produce CC pairs"
    assert set(pairs[0]) == {"kh", "kl", "mid"}
    # both mentions of a scored pair share one synthetic key
    by_key = {}
    for p in pairs:
        by_key.setdefault((p["kh"], p["kl"]), set()).add(p["mid"])
    assert any(v == {0, 1} for v in by_key.values())


def test_q_kg_linking_pairs_complete(ray_session):
    """Pytest oracle for q_kg_linking: every (2i, 2i+1) derived variant pair
    links, and no cross-document hex stems do."""
    import pyarrow.parquet as pq

    from knowledgegraph_ray.pipelines.queries import q_kg_linking

    sf_dir = "/root/testdata/sf0.001"
    n_docs = min(
        pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows, 5000
    )
    got = {(r["mid_a"], r["mid_b"]) for r in q_kg_linking(sf_dir).take_all()}
    want = {(2 * i, 2 * i + 1) for i in range(n_docs)}
    missing = want - got
    extra = got - want
    assert not missing, f"{len(missing)} variant pairs missed: {sorted(missing)[:5]}"
    assert not extra, f"{len(extra)} spurious cross-doc links: {sorted(extra)[:5]}"
