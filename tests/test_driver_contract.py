"""Rehearsal of the driver's correctness gate: every queries() entry runs at
sf0.01 and, where an oracle_sql() entry exists, must match DuckDB exactly
(row count, column names, values after canonical sorting)."""

import importlib.util
import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry_module()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.reset_index(drop=True)


def _assert_equal(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r}"
            else:
                assert str(a) == str(b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


def test_oracle_keys_subset_of_queries(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(o) >= 15


def test_no_duplicate_query_defs_or_dict_keys():
    """A second `def q_x` (or a repeated dict-literal key) silently shadows
    the first — Python keeps the last binding, so a query and its oracle can
    vanish from the contract with every test still green (happened to q_mad,
    round 3).  Guard at the AST level."""
    import ast
    from knowledgegraph_ray.pipelines import queries as qmod

    tree = ast.parse(open(qmod.__file__.rstrip("c")).read())
    seen, dup_defs = set(), []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            if node.name in seen:
                dup_defs.append(node.name)
            seen.add(node.name)
    assert not dup_defs, f"duplicate top-level defs: {dup_defs}"
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            dups = {k for k in keys if keys.count(k) > 1}
            assert not dups, f"duplicate dict keys at line {node.lineno}: {dups}"


REHEARSED_ORACLE_QUERIES = [
    # previously rehearsed only by the driver itself — every oracle-backed
    # query must appear here so drift is caught before the driver run
    # (test_rehearsal_list_is_complete enforces the 1:1 match)
    "q_asof_forward", "q_bloom_semi_join", "q_boilerplate_strip",
    "q_cumulative_distinct", "q_domain_cap", "q_inverted_index",
    "q_knn_pq", "q_knn_sq8", "q_link_predict_ra", "q_outliers_iqr",
    "q_sessionize", "q_substring_dedup", "q_table_diff", "q_tfidf",
    "q_token_shards", "q_top_terms", "q_top_terms_sketch",
    "q_transition_matrix", "q_unpivot", "q_weighted_median",
    "q_filter_project", "q_point_lookup", "q_groupby_count",
    "q_doc_stats_by_source", "q_topk_events", "q_sorted_limit", "q_join_agg",
    "q_left_join", "q_rollup_revenue", "q_cube_events", "q_rrf_fusion",
    "q_top_terms_by_source", "q_full_outer", "q_latest_event", "q_funnel",
    "q_time_to_convert", "q_dense_grid", "q_encode_tokens", "q_top_bigrams",
    "q_retention", "q_user_entropy", "q_winsorized_mean",
    "q_centroid_per_label", "q_ratio_to_report", "q_cluster_inertia",
    "q_intra_doc_repetition",
    "q_semi_join", "q_set_ops", "q_anti_join", "q_lineitem_agg",
    "q_events_hourly",
    "q_token_count", "q_feature_hash", "q_bpe_tokens", "q_quality",
    "q_exact_dedup",
    "q_passage_dedup",
    "q_sentences",
    "q_url_normalize", "q_fuzzy_match", "q_triangles",
    "q_connected_components", "q_degree_hist", "q_assortativity",
    "q_link_predict", "q_link_predict_jaccard",
    "q_decontaminate", "q_decontaminate_tokens", "q_bm25_topk",
    "q_decontaminate_semantic",
    "q_ngram_jaccard_1k", "q_pii_mask", "q_gopher_quality",
    "q_norm_text", "q_sample_uniform",
    "q_sample_stratified", "q_sample_weighted", "q_sample_stratified_exact",
    "q_split_assign", "q_chunk_windows",
    "q_knn_top10",
    "q_neardup_pairs", "q_asof_join", "q_range_join", "q_rolling_sum",
    "q_top3_orders", "q_value_median", "q_value_p90", "q_value_p90_hist",
    "q_value_median_cont",
    "q_profile_events",
    "q_mode_per_user",
    "q_user_journey",
    "q_corr_qty_price",
    "q_ols_per_flag",
    "q_json_extract",
    "q_cooccur_parts",
    "q_basket_lift",
    "q_first_last",
    "q_pmi_bigrams",
    "q_clustering_coeff",
    "q_interval_coverage",
    "q_pack_sequences",
    "q_resample_locf",
    "q_containment",
    "q_token_commonness",
    "q_hopping_window",
    "q_event_lag_delta",
    "q_rank_windows", "q_dist_windows", "q_zscore", "q_skewness",
    "q_weighted_avg", "q_minmax_norm",
    "q_case_bucket", "q_revenue_by_nation", "q_distinct_users",
    "q_order_priority", "q_status_pivot", "q_above_avg",
    "q_sssp", "q_harmonic_parts", "q_skyline", "q_mutual_nn",
    "q_quota_sample", "q_keyness_chi2", "q_twap", "q_gini",
    "q_data_audit",
    "q_editdist_names",
    "q_source_overlap", "q_mad", "q_mad_by_type", "q_lm_perplexity",
    "q_lexical_diversity",
    "q_kg_nodes_by_type", "q_kg_edges_by_type",
]


def test_rehearsal_list_is_complete(entry_mod):
    """Every oracle-backed query is rehearsed here and vice versa — a new
    ORACLE_SQL entry without a rehearsal row (or a stale row) fails fast."""
    assert set(REHEARSED_ORACLE_QUERIES) == set(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", REHEARSED_ORACLE_QUERIES)
def test_query_matches_oracle(entry_mod, duck, name):
    q = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    got = _to_pandas(q[name](SF_DIR))
    want = duck.execute(sql).df()
    _assert_equal(name, got, want)


@pytest.mark.parametrize("name", [
    "q_dedup_keep_best",
    "q_lang_id", "q_rolling_fp", "q_simhash", "q_minhash_lsh", "q_ivf_knn",
    "q_hnsw_knn",
    "q_kg_nodes_by_type", "q_kg_edges_by_type", "q_kg_linking",
    "q_kg_khop", "q_kg_communities", "q_kg_walks", "q_kg_ego",
    "q_quality_classifier", "q_bpe_train", "q_curate_corpus",
])
def test_rows_only_queries_run(entry_mod, name):
    got = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert len(got) >= 0
    assert len(got.columns) >= 1


def test_lang_id_heuristic_on_real_sentences():
    """The documents table's lang labels are synthetic (same English word
    salad for every label), so the heuristic is validated on natural
    sentences instead; over documents it's a rows-only deterministic op."""
    from knowledgegraph_ray.stages.textops import detect_lang

    cases = {
        "en": "the quick brown fox jumps over the lazy dog and runs to the barn",
        "de": "der schnelle braune fuchs springt über den faulen hund und das ist gut",
        "fr": "le renard brun saute sur le chien paresseux dans la forêt pour un moment",
        "es": "el zorro marrón salta sobre el perro perezoso en el bosque para su casa",
        "zh": "敏捷的棕色狐狸跳过了懒狗然后跑向谷仓这是一个测试句子需要足够的汉字字符来触发检测逻辑",
    }
    for lang, sentence in cases.items():
        assert detect_lang(sentence) == lang, (lang, detect_lang(sentence))
    assert detect_lang("") == "unknown"


def test_lang_id_deterministic(entry_mod):
    a = _to_pandas(entry_mod.queries()["q_lang_id"](SF_DIR)).sort_values("doc_id")
    b = _to_pandas(entry_mod.queries()["q_lang_id"](SF_DIR)).sort_values("doc_id")
    assert a["lang_pred"].tolist() == b["lang_pred"].tolist()


def test_entry_runs(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "name" in df.columns and "type" in df.columns


def test_sessionize_matches_oracle(entry_mod, duck):
    got = _to_pandas(entry_mod.queries()["q_sessionize"](SF_DIR))
    want = duck.execute(entry_mod.oracle_sql()["q_sessionize"]).df()
    _assert_equal("q_sessionize", got, want)


def test_sessionize_semantics():
    """Unit semantics: gap > 30min opens a new session; ties break on id."""
    from datetime import datetime, timedelta

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.windows import sessionize

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1), (1, t0 + timedelta(minutes=10), 2),       # same session
        (1, t0 + timedelta(minutes=50), 3),                   # new session
        (2, t0, 4),                                            # other user
        (2, t0 + timedelta(minutes=31), 5),                   # new session
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = {r["user_id"]: r for r in sessionize(ds).take_all()}
    assert out[1]["n_sessions"] == 2 and out[1]["n_events"] == 3
    assert out[2]["n_sessions"] == 2 and out[2]["n_events"] == 2
