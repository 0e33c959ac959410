"""Driver-contract query implementations over the testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / Arrow table;
``ORACLE_SQL`` holds the DuckDB-equivalent ANSI SQL keyed by query name.
Column names match the SQL aliases exactly (the driver hash-compares by
sorted column name).  Float columns are canonicalized identically on both
sides: money → integer cents via floor(x*100 + 0.5); scores/cosines →
floor(x*1e4)/1e4 — no engine-specific rounding mode can diverge.

Reference-capability mapping (SURVEY.md §2): filters/projections (S2, M2),
point lookup (S3/K2), groupby histograms (D9/K3), ordered top-k (K1/K4),
joins incl. semi/anti (J1–J3 analogs), exact dedup (D6 analog on documents),
text metrics (M1-adjacent QA ops), vector search (K1).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages import knn as knn_mod
from ..stages.dedup import exact_dedup_groups
from ..stages.textops import (
    add_lang_id,
    add_quality_score,
    add_rolling_fingerprint,
    add_token_count,
)

# Deterministic 64-dim query vector (embeddings.parquet is 64-dim); the SQL
# literal uses full repr so both engines parse the identical double.
KNN_QUERY_VEC = np.sin(np.arange(64, dtype=np.float64) + 1.0)
_KNN_SQL_LITERAL = "[" + ", ".join(repr(float(v)) for v in KNN_QUERY_VEC) + "]"
NEARDUP_THRESHOLD = 0.45


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _cents(batch: pa.Table, col: str, out: str) -> pa.Table:
    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(batch.column(col), 100.0), 0.5)), pa.int64()
    )
    return batch.append_column(out, cents)


# ---------------------------------------------------------------------------
# Relational core
# ---------------------------------------------------------------------------


def q_filter_project(sf_dir: str):
    """S2/M2: predicate + projection, pruned at the read."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
        filter=(pc.field("lang") == "en") & (pc.field("n_chars") > 300),
    )
    return ds.select_columns(["doc_id", "source", "n_chars"])


def q_point_lookup(sf_dir: str):
    """S3/K2: point lookup by key."""
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
        filter=pc.field("doc_id") == 42,
    )


def q_groupby_count(sf_dir: str):
    """D9/K3: histogram by lang (map-side partial count, tiny final agg)."""
    from ..stages.aggregates import partial_grouped_agg

    return partial_grouped_agg(
        _docs(sf_dir, ["lang"]), ["lang"], count_alias="n_docs"
    )


def q_doc_stats_by_source(sf_dir: str):
    """D9/D10: per-source doc count + char sum + char extremes — map-side
    partials collapse each block to one row per source before the shuffle."""
    from ..stages.aggregates import partial_grouped_agg

    return partial_grouped_agg(
        _docs(sf_dir, ["source", "n_chars"]),
        ["source"],
        sums={"n_chars": "sum_chars"},
        mins={"n_chars": "min_chars"},
        maxs={"n_chars": "max_chars"},
        count_alias="n_docs",
    )


def q_topk_events(sf_dir: str):
    """K1/K4: global top-k by value (per-block prune happens in sort)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    top = ds.sort(["value", "event_id"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda b: _cents(b, "value", "value_cents").drop_columns(["value"]),
        batch_format="pyarrow",
    )


def q_sorted_limit(sf_dir: str):
    """K3/K4: ordered listing with cap."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(5)
    return top.map_batches(
        lambda b: _cents(b, "o_totalprice", "price_cents").drop_columns(["o_totalprice"]),
        batch_format="pyarrow",
    )


def q_join_agg(sf_dir: str):
    """J1-analog: fact stream ⋈ broadcast dimension, then aggregate.
    orders joined to customer (small side broadcast) → per-mktsegment stats."""
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "price_cents").drop_columns(["o_totalprice"]),
        batch_format="pyarrow",
    )
    from ..functions.joins import adaptive_join

    joined = adaptive_join(
        orders, customer, left_keys=["o_custkey"], right_keys=["c_custkey"], how="inner"
    )
    from ..stages.aggregates import partial_grouped_agg

    return partial_grouped_agg(
        joined, ["c_mktsegment"],
        sums={"price_cents": "sum_cents"}, count_alias="n_orders",
    )


def q_left_join(sf_dir: str):
    """Left outer join with null-fill: every customer with order count and
    spend, ZERO for order-less customers.  Scale shape: the fact side is
    aggregated FIRST (map-side combined groupby → O(customers) rows), then
    the dimension left-joins the aggregate — never a raw-fact outer join."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import partial_grouped_agg

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "price_cents").drop_columns(
            ["o_totalprice"]
        ),
        batch_format="pyarrow",
    )
    per_cust = partial_grouped_agg(
        orders, ["o_custkey"], sums={"price_cents": "spent_cents"},
        count_alias="n_orders",
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = adaptive_join(
        cust, per_cust, left_keys=["c_custkey"], right_keys=["o_custkey"],
        how="left",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "c_custkey": b.column("c_custkey"),
                "n_orders": pc.fill_null(
                    pc.cast(b.column("n_orders"), pa.int64()), 0
                ),
                "spent_cents": pc.fill_null(
                    pc.cast(b.column("spent_cents"), pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_rollup_revenue(sf_dir: str):
    """ROLLUP (grouping sets) — revenue by (nation, order year) at every
    prefix level incl. the grand total.  The input is aggregated once; the
    coarser levels cascade from the finest partials (see rollup_agg)."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import rollup_agg

    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "cents")
        .append_column("yr", pc.cast(pc.year(b.column("o_orderdate")), pa.int64()))
        .drop_columns(["o_totalprice", "o_orderdate"]),
        batch_format="pyarrow",
    )
    j = adaptive_join(
        orders, customer, left_keys=["o_custkey"], right_keys=["c_custkey"]
    )
    j = adaptive_join(
        j, nation, left_keys=["c_nationkey"], right_keys=["n_nationkey"]
    )
    return rollup_agg(
        j, ["n_name", "yr"],
        sums={"cents": "revenue_cents"}, count_alias="n_orders",
        sentinels={"n_name": "ALL", "yr": -1},
    )


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (the hybrid-retrieval combiner): two
    independent top-100 document rankings — by token count (the "lexical"
    leg) and by md5 fingerprint order (a deterministic second signal) —
    fused with score = Σ 1/(60 + rank).  Each leg is a distributed
    sort+limit; the fuse itself runs on the two BOUNDED k-row lists (the
    accepted driver-side small-result shape).  Scores floor to 1e-8 cells
    so engine doubles hash identically; ties break by doc_id."""
    import numpy as np

    from ..stages.textops import add_md5_fingerprint, add_token_count

    K, C = 100, 60
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    leg_a = (
        docs.map_batches(
            lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
        )
        .sort(["n_tokens", "doc_id"], descending=[True, False])
        .limit(K).take_all()
    )
    leg_b = (
        docs.map_batches(
            lambda b: add_md5_fingerprint(b).select(["doc_id", "fingerprint"]),
            batch_format="pyarrow",
        )
        .sort(["fingerprint", "doc_id"]).limit(K).take_all()
    )
    score: dict[int, float] = {}
    for leg in (leg_a, leg_b):
        for rank, row in enumerate(leg, start=1):
            score[row["doc_id"]] = score.get(row["doc_id"], 0.0) + 1.0 / (C + rank)
    ids = sorted(score, key=lambda d: (-score[d], d))[:20]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "rrf": pa.array([np.floor(score[d] * 1e8) / 1e8 for d in ids],
                        pa.float64()),
    })


def q_cube_events(sf_dir: str):
    """CUBE grouping sets — event value totals at EVERY subset of
    (event_type, uid_bucket): all 2^2 levels cascade from one materialized
    finest-level aggregate (see cube_agg)."""
    from ..stages.aggregates import cube_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "cents")
        .append_column(
            "uid_bucket",
            pc.cast(pc.bit_wise_and(b.column("user_id"), 7), pa.int64()),
        )
        .drop_columns(["value", "user_id"]),
        batch_format="pyarrow",
    )
    return cube_agg(
        ds, ["event_type", "uid_bucket"],
        sums={"cents": "value_cents"}, count_alias="n_events",
        sentinels={"event_type": "ALL", "uid_bucket": -1},
    )


def q_semi_join(sf_dir: str):
    """J2-analog (left semi): customers with at least one order, per nation.
    The probe side is a shuffle-free distinct-key set (per-block unique +
    one combine task) broadcast into the join."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys, partial_grouped_agg

    orders_keys = distinct_keys(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        ["o_custkey"],
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    semi = adaptive_join(
        customer, orders_keys, left_keys=["c_custkey"], right_keys=["o_custkey"], how="inner"
    )
    return partial_grouped_agg(
        semi, ["c_nationkey"], count_alias="n_customers"
    ).rename_columns({"c_nationkey": "nationkey"})


def q_set_ops(sf_dir: str):
    """SQL set algebra (INTERSECT then EXCEPT) on user_id event slices:
    high-value purchasers ∩ signups ∖ high-value errorers (the value
    filters keep the result non-degenerate on the synthetic corpus, where
    every user touches every event type).  Each leg is a shuffle-free
    distinct-key build (per-block unique + one combine task); INTERSECT is
    a broadcast semi join, EXCEPT a left join + null filter — the whole
    query never shuffles the event rows themselves."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys

    def leg(event_type: str, min_value: float | None = None) -> rd.Dataset:
        def flt(b: pa.Table, et=event_type, mv=min_value) -> pa.Table:
            m = pc.equal(b.column("event_type"), et)
            if mv is not None:
                m = pc.and_(m, pc.greater(b.column("value"), mv))
            return b.filter(m).select(["user_id"])

        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"],
        ).map_batches(flt, batch_format="pyarrow")
        return distinct_keys(ds, ["user_id"])

    inter = adaptive_join(
        leg("purchase", 50.0), leg("signup"), left_keys=["user_id"], how="inner"
    )
    marked = adaptive_join(
        inter,
        leg("error", 80.0).map_batches(
            lambda b: b.append_column("has", pa.array([1] * b.num_rows, pa.int8())),
            batch_format="pyarrow",
        ),
        left_keys=["user_id"], how="left",
    )
    return marked.map_batches(
        lambda b: b.filter(pc.is_null(b.column("has"))).select(["user_id"]),
        batch_format="pyarrow",
    )


def q_bloom_semi_join(sf_dir: str):
    """Bloom-prefiltered exact semi join: lineitems of URGENT orders, per
    returnflag.  The probe (lineitem, the big side at scale) streams through
    a 12-bit/key Bloom membership test built from the order-key set BEFORE
    any exchange — only matches plus the ~0.8% false-positive residue reach
    the exact join, which removes them.  Result is identical to a plain
    semi join (the bloom admits no false negatives)."""
    from ..functions.bloom import bloom_semi_join
    from ..stages.aggregates import partial_grouped_agg

    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).select_columns(["o_orderkey"])
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    semi = bloom_semi_join(
        lineitem, urgent, left_keys=["l_orderkey"], right_keys=["o_orderkey"]
    )
    return partial_grouped_agg(semi, ["l_returnflag"], count_alias="n_items")


def q_anti_join(sf_dir: str):
    """M3/J2-analog (left anti): orders with no lineitems, per priority — the
    same shape as checkpoint-resume's skip-done anti-join.  The existence set
    is a shuffle-free distinct-key build; the left join broadcasts it."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys, partial_grouped_agg

    li_keys = distinct_keys(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]),
        ["l_orderkey"],
    ).map_batches(
        lambda b: b.append_column("has", pa.array([1] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = adaptive_join(
        orders, li_keys, left_keys=["o_orderkey"], right_keys=["l_orderkey"], how="left"
    )
    anti = joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("has"))), batch_format="pyarrow"
    )
    return partial_grouped_agg(anti, ["o_orderpriority"], count_alias="n_orders")


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped wide aggregate with per-batch cents projection."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_quantity", "qty_cents")
        b = _cents(b, "l_extendedprice", "price_cents")
        b = _cents(b, "l_discount", "disc_cents")
        return b.select(["l_returnflag", "l_linestatus", "qty_cents", "price_cents", "disc_cents"])

    from ..stages.aggregates import partial_grouped_agg

    return partial_grouped_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sums={
            "qty_cents": "sum_qty_cents",
            "price_cents": "sum_price_cents",
            "disc_cents": "sum_disc_cents",
        },
        count_alias="n_rows",
    )


def q_events_hourly(sf_dir: str):
    """Streaming-style bucketed aggregate: events per (hour, type)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        hour = pc.strftime(pc.floor_temporal(b.column("ts"), unit="hour"), format="%Y-%m-%d %H:00:00")
        b = b.append_column("hour", hour)
        b = _cents(b, "value", "value_cents")
        return b.select(["hour", "event_type", "value_cents"])

    from ..stages.aggregates import partial_grouped_agg

    return partial_grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["hour", "event_type"],
        sums={"value_cents": "sum_value_cents"},
        count_alias="n",
    )


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity (training-data ops)
# ---------------------------------------------------------------------------


def q_sessionize(sf_dir: str):
    """Streaming-style gap-based session windows (30-min gap) per user."""
    from ..stages.windows import sessionize

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    return sessionize(ds, gap_minutes=30)


def q_asof_join(sf_dir: str):
    """As-of join: each event picks the latest order (same customer,
    o_orderdate <= event ts; date ties broken by max o_orderkey).  Left
    semantics — events with no prior order keep nulls."""
    from ..stages.temporal import asof_join

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "o_price_cents").select(
            ["o_custkey", "o_orderdate", "o_orderkey", "o_price_cents"]
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_price_cents"],
        right_order="o_orderkey",
    )
    return joined.select_columns(["event_id", "user_id", "o_orderkey", "o_price_cents"])


def q_asof_forward(sf_dir: str):
    """FORWARD as-of join: each event picks the EARLIEST order (same
    customer, o_orderdate >= event ts; date ties broken by max o_orderkey)
    — the "next event after" join, via the negated-timestamp mapping onto
    the backward scan."""
    from ..stages.temporal import asof_join

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "o_price_cents").select(
            ["o_custkey", "o_orderdate", "o_orderkey", "o_price_cents"]
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_price_cents"],
        right_order="o_orderkey",
        direction="forward",
    )
    return joined.select_columns(
        ["event_id", "user_id", "o_orderkey", "o_price_cents"]
    )


def q_range_join(sf_dir: str):
    """Bounded-lookahead self range join: event pairs per user within 60
    minutes (strictly after)."""
    from ..stages.temporal import range_join

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return range_join(
        events, key="user_id", ts="ts", id_col="event_id", width_us=60 * 60 * 1_000_000
    )


def q_rolling_sum(sf_dir: str):
    """SQL RANGE-frame rolling sum: per event, the sum of value-cents over
    the same user's events in the trailing 60 minutes (inclusive)."""
    from ..stages.windows import rolling_range_sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").select(
            ["event_id", "user_id", "ts", "value_cents"]
        ),
        batch_format="pyarrow",
    )
    return rolling_range_sum(
        ds, key_col="user_id", ts_col="ts", value_col="value_cents",
        id_col="event_id", width_us=60 * 60 * 1_000_000,
    )


def q_top3_orders(sf_dir: str):
    """Top-3 orders per customer by price (row_number window ≤ 3)."""
    from ..stages.windows import topn_per_group

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "price_cents").select(
            ["o_custkey", "o_orderkey", "price_cents"]
        ),
        batch_format="pyarrow",
    )
    return topn_per_group(
        ds, key_col="o_custkey", order_col="price_cents", n=3,
        descending=True, tiebreak_col="o_orderkey",
    )


def q_value_median(sf_dir: str):
    """Exact per-type discrete median of event value-cents
    (quantile_disc 0.5 semantics)."""
    from ..stages.aggregates import grouped_median

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").select(
            ["event_type", "value_cents"]
        ),
        batch_format="pyarrow",
    )
    return grouped_median(
        ds, key_col="event_type", value_col="value_cents", out_col="median_cents"
    )


def q_distinct_users(sf_dir: str):
    """Per-type distinct user count with map-side partial dedup."""
    from ..stages.aggregates import grouped_count_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_count_distinct(
        ds, key_col="event_type", value_col="user_id", out_col="n_users"
    )


def q_distinct_users_hll(sf_dir: str):
    """Approximate GLOBAL distinct users via HyperLogLog (p=14, ~0.8% s.e.):
    the 100-TB path where the exact distinct's shuffle is the bottleneck —
    one register vector per block, tree-merged in zero-CPU tasks.  Rows-only
    by nature (DuckDB's approx_count_distinct uses its own HLL variant); the
    pytest oracle bounds the error vs exact and proves partition invariance."""
    from ..stages.aggregates import hll_count_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_count_distinct(ds, ["user_id"], p=14)


def q_distinct_users_hll_by_type(sf_dir: str):
    """Per-event-type approximate distinct users: one 4 KB register row per
    (group, block) through the hash exchange instead of every distinct pair."""
    from ..stages.aggregates import grouped_hll_count_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_hll_count_distinct(
        ds, key_col="event_type", value_col="user_id", p=12
    )


def q_feature_hash(sf_dir: str):
    """Hashing-trick featurizer over the documents table: long sparse
    (doc_id, feature, tf) matrix at 1024 features, md5 hash convention so
    the SQL oracle mirrors bit-for-bit.  ONE streaming map — a doc never
    spans blocks, so per-block group counts are final; no shuffle."""
    from ..stages.textops import hashing_features

    return hashing_features(
        _docs(sf_dir, ["doc_id", "text"]), n_features=1024, method="md5"
    )


def q_token_count(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


def q_bpe_tokens(sf_dir: str):
    from ..stages.textops import add_bpe_token_count

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_bpe_token_count(b).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


def q_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_quality_score(b).select(["doc_id", "n_tokens", "n_punct", "quality_score"]),
        batch_format="pyarrow",
    )


def q_pii_mask(sf_dir: str):
    from ..stages.textops import add_pii_masked

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_pii_masked(b).select(
            ["doc_id", "n_emails", "n_phones", "masked_text"]
        ),
        batch_format="pyarrow",
    )


def q_gopher_quality(sf_dir: str):
    from ..stages.textops import add_gopher_flags

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_gopher_flags(b).select(
            ["doc_id", "n_tokens", "mean_word_len", "symbol_ratio", "gopher_keep"]
        ),
        batch_format="pyarrow",
    )


def q_norm_text(sf_dir: str):
    from ..stages.textops import add_normalized_text

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_normalized_text(b).select(["doc_id", "norm_text"]),
        batch_format="pyarrow",
    )


def q_top_terms(sf_dir: str):
    """Corpus wordcount top-50: vectorized tokenize → per-block value_counts
    (map-side combine) → small groupby-sum → sort+limit over group rows."""
    from ..stages.textops import top_terms

    return top_terms(_docs(sf_dir, ["text"]), k=50)


def q_inverted_index(sf_dir: str):
    """Inverted-index build (retrieval-infra sink): term → (df, tf,
    ascending comma-joined posting list).  One RE2 split + C++ group_by
    per block (exchange moves distinct (term, doc) pairs, never tokens),
    hash exchange on term, vectorized per-run reduceat + binary_join."""
    from ..stages.textops import inverted_index

    return inverted_index(_docs(sf_dir, ["doc_id", "text"])).sort("term")


def q_top_terms_by_source(sf_dir: str):
    """Per-source top-5 terms (grouped heavy hitters): tokenize → map-side
    combined (source, term) counts → grouped_topk (hash exchange + ONE
    multi-key C++ sort per reduce partition, grouped-arange selection)."""
    from ..stages.aggregates import grouped_topk, partial_grouped_agg
    from ..stages.textops import doc_token_rows

    docs = _docs(sf_dir, ["source", "text"])
    tok = docs.map_batches(
        lambda b: doc_token_rows(b, id_col="source").rename_columns(
            ["source", "term"]
        ),
        batch_format="pyarrow",
    )
    counts = partial_grouped_agg(tok, ["source", "term"], count_alias="cnt")
    return grouped_topk(
        counts, ["source"], value_col="cnt", tiebreak_cols=["term"], k=5
    )


def q_encode_tokens(sf_dir: str):
    """Corpus tokenization → vocabulary build → integer encoding (the
    training-data artifact an LLM pipeline actually emits): vocab = top-20
    terms by (count desc, term), ids 1..20, OOV → 0; every document then
    encodes to (doc_id, pos, tid) rows via ONE vectorized `index_in`
    against the broadcast vocab array — the counts exchange is
    O(vocab × blocks), the encode pass is a pure streaming map."""
    from ..stages.aggregates import partial_grouped_agg

    docs = _docs(sf_dir, ["doc_id", "text"])

    def term_rows(b: pa.Table) -> pa.Table:
        # SAME tokenization as the encode pass and the SQL mirror: raw
        # single-space split, no lowering, empties kept
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table({"term": pc.list_flatten(toks)})

    counts = partial_grouped_agg(
        docs.map_batches(term_rows, batch_format="pyarrow"),
        ["term"], count_alias="c",
    ).take_all()
    vocab = [r["term"] for r in
             sorted(counts, key=lambda r: (-r["c"], r["term"]))[:20]]
    vocab_arr = pa.array(vocab, pa.string())

    def encode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = np.repeat(
            b.column("doc_id").to_numpy(zero_copy_only=False), lens
        )
        ends = np.cumsum(lens)
        pos = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
            - np.repeat(ends - lens, lens)
        tid = pc.add(pc.index_in(flat, value_set=vocab_arr),
                     pa.scalar(1, pa.int32()))
        tid = pc.cast(pc.fill_null(tid, 0), pa.int64())
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "tid": tid,
        })

    return docs.map_batches(encode, batch_format="pyarrow")


def q_top_bigrams(sf_dir: str):
    """Corpus top-20 word bigrams: adjacent token pairs form WITHIN each
    doc by one offset shift over the flattened token buffer (a pair never
    spans two docs), map-side-combined counts, exact top-20 by (count
    desc, bigram) — no join, no per-row Python."""
    from ..stages.aggregates import partial_grouped_agg

    def bigrams(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        total = int(lens.sum())
        # left indices of in-doc adjacent pairs: every flat position except
        # each doc's last token
        ends = np.cumsum(lens)
        left = np.ones(total, bool)
        left[ends - 1] = False
        li = np.flatnonzero(left)
        a = flat.take(pa.array(li, pa.int64()))
        c = flat.take(pa.array(li + 1, pa.int64()))
        bg = pc.binary_join_element_wise(a, c, " ")
        return pa.table({"bigram": bg})

    counts = partial_grouped_agg(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bigrams, batch_format="pyarrow"
        ),
        ["bigram"], count_alias="n",
    )
    top = sorted(counts.take_all(), key=lambda r: (-r["n"], r["bigram"]))[:20]
    return pa.table({
        "bigram": pa.array([r["bigram"] for r in top], pa.string()),
        "n": pa.array([r["n"] for r in top], pa.int64()),
    })


def q_dense_grid(sf_dir: str):
    """Dense reporting grid with zero-fill: every (user × day) cell,
    including days a user was inactive (~half the grid at sf0.1) — the
    distinct legs are small (shuffle-free `distinct_keys`), their cross
    product builds in one bounded task, and the O(users × days) grid
    left-joins the map-side-combined counts with coalesce-0.  Event rows
    never shuffle."""
    from ..functions.joins import lookup_join
    from ..stages.aggregates import distinct_keys, partial_grouped_agg

    def day_map(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        return pa.Table.from_pydict({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "day": pc.divide(us, 86_400_000_000),
        })

    e = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(day_map, batch_format="pyarrow")
    counts = partial_grouped_agg(e, ["user_id", "day"], count_alias="n")
    users = sorted(
        r["user_id"] for r in distinct_keys(e, ["user_id"]).take_all()
    )
    days = sorted(r["day"] for r in distinct_keys(e, ["day"]).take_all())
    grid = rd.from_arrow(pa.table({
        "user_id": pa.array(np.repeat(users, len(days)), pa.int64()),
        "day": pa.array(np.tile(days, len(users)), pa.int64()),
    }))
    counts_tbl = pa.Table.from_pylist(
        counts.take_all(),
        schema=pa.schema([("user_id", pa.int64()), ("day", pa.int64()),
                          ("n", pa.int64())]),
    )
    j = lookup_join(grid, counts_tbl, left_keys=["user_id", "day"],
                    how="left")
    return j.map_batches(
        lambda b: b.set_column(
            b.column_names.index("n"), "n",
            pc.fill_null(pc.cast(b.column("n"), pa.int64()), 0),
        ),
        batch_format="pyarrow",
    )


_FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_first_times(sf_dir: str, steps: list[str]) -> rd.Dataset:
    """Per-user FIRST timestamp of each funnel step (min-timestamp
    semantics, the standard product-analytics approximation): one
    map-side-combined grouped MIN over type-masked timestamp columns
    (exchange O(users × blocks)) — event rows never shuffle.  The one
    oracle-critical definition of "first view/click/purchase" that
    q_funnel and q_time_to_convert share."""
    from ..stages.aggregates import partial_grouped_agg

    def mask(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64())
        et = b.column("event_type")
        cols = {"user_id": b.column("user_id")}
        for s in steps:
            cols[f"_t_{s}"] = pc.if_else(pc.equal(et, s), ts,
                                         pa.scalar(None, pa.int64()))
        return pa.Table.from_pydict(cols)

    return partial_grouped_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts"],
        ).map_batches(mask, batch_format="pyarrow"),
        ["user_id"],
        mins={f"_t_{s}": f"t_{s}" for s in steps},
    )


def q_funnel(sf_dir: str):
    """Conversion-funnel analysis: users whose first view precedes their
    first click precedes their first purchase (see
    ``_funnel_first_times``), then a vectorized three-way comparison."""
    steps = _FUNNEL_STEPS
    mins = _funnel_first_times(sf_dir, steps)

    def converted(b: pa.Table) -> pa.Table:
        t1, t2, t3 = (b.column(f"t_{s}") for s in steps)
        ok = pc.and_(pc.less(t1, t2), pc.less(t2, t3))  # null-safe: null→null
        n = pc.sum(pc.cast(ok, pa.int64()))  # sum skips nulls
        return pa.table({"n": pa.array([n.as_py() or 0], pa.int64())})

    part = mins.map_batches(converted, batch_format="pyarrow")
    total = sum(r["n"] for r in part.take_all())
    return pa.table({"n_converted": pa.array([total], pa.int64())})


def q_cluster_inertia(sf_dir: str):
    """Within-cluster sum of squared distances to the (floored) centroid —
    the k-means quality metric as a two-pass aggregate: centroids from the
    first combined pass broadcast back (O(labels × dims) rows), squared
    residuals accumulate in the second streaming pass; 1e-4 floor absorbs
    cross-engine summation-order ulps over the ~32k terms per label."""
    from ..functions.joins import lookup_join
    from ..stages.aggregates import partial_grouped_agg

    rows = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    ).map_batches(_explode_embeddings, batch_format="pyarrow").materialize()
    sums = partial_grouped_agg(
        rows, ["label", "dim"], sums={"v": "s"}, count_alias="n"
    ).take_all()
    cent = pa.table({
        "label": pa.array([r["label"] for r in sums], pa.int64()),
        "dim": pa.array([r["dim"] for r in sums], pa.int64()),
        "c": pa.array(
            [np.floor(r["s"] / r["n"] * 1e6) / 1e6 for r in sums],
            pa.float64(),
        ),
    })
    j = lookup_join(rows, cent, left_keys=["label", "dim"], how="inner")

    def sq(b: pa.Table) -> pa.Table:
        d = pc.subtract(b.column("v"), b.column("c"))
        return pa.Table.from_pydict({
            "label": b.column("label"), "_sq": pc.multiply(d, d),
        })

    tot = partial_grouped_agg(
        j.map_batches(sq, batch_format="pyarrow"), ["label"],
        sums={"_sq": "ss"},
    )
    return tot.map_batches(
        lambda b: pa.Table.from_pydict({
            "label": b.column("label"),
            "inertia_r": pa.array(
                np.floor(
                    b.column("ss").to_numpy(zero_copy_only=False) * 1e4
                ) / 1e4,
                pa.float64(),
            ),
        }),
        batch_format="pyarrow",
    )


def q_ratio_to_report(sf_dir: str):
    """Per-row share of its group's total (the RATIO_TO_REPORT window):
    exact int64 group sums (map-side combined) broadcast back, one float
    division per row, 1e-8 floor — the same no-shuffle per-row-enrichment
    shape as grouped_zscore."""
    from ..functions.joins import lookup_join
    from ..stages.aggregates import partial_grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    sums = partial_grouped_agg(ds, ["event_type"], sums={"v": "s"})
    tot = pa.Table.from_pylist(sums.take_all())
    j = lookup_join(ds, tot, left_keys=["event_type"], how="inner")

    def ratio(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "event_id": b.column("event_id"),
            "share": pa.array(np.floor(v / s * 1e8) / 1e8, pa.float64()),
        })

    return j.map_batches(ratio, batch_format="pyarrow")


def _explode_embeddings(b: pa.Table) -> pa.Table:
    """embeddings batch → (label, dim, v float64) rows, fully vectorized
    (list_flatten + offset-math dim indices)."""
    b = b.combine_chunks()
    emb = b.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
    v = pc.cast(pc.list_flatten(emb), pa.float64())
    lab = np.repeat(
        pc.cast(b.column("label"), pa.int64()).to_numpy(zero_copy_only=False),
        lens,
    )
    ends = np.cumsum(lens)
    dim = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
        - np.repeat(ends - lens, lens)
    return pa.Table.from_pydict({
        "label": pa.array(lab, pa.int64()),
        "dim": pa.array(dim, pa.int64()),
        "v": v,
    })


def q_centroid_per_label(sf_dir: str):
    """Per-label embedding centroid (the k-means M-step as a standalone
    vector-column aggregate): explode list<float> → (label, dim, v) rows,
    map-side-combined float64 sums (exchange O(labels × dims × blocks)),
    one division, 1e-6 floor (float summation order differs between
    engines by ~1e-12 — cells absorb it)."""
    from ..stages.aggregates import partial_grouped_agg

    rows = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    ).map_batches(_explode_embeddings, batch_format="pyarrow")
    sums = partial_grouped_agg(
        rows, ["label", "dim"], sums={"v": "s"}, count_alias="n"
    )

    def fin(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "label": b.column("label"),
            "dim": b.column("dim"),
            "c": pa.array(np.floor(s / n * 1e6) / 1e6, pa.float64()),
        })

    return sums.map_batches(fin, batch_format="pyarrow")


def q_winsorized_mean(sf_dir: str):
    """Winsorized mean (robust statistics): per event_type, the mean of
    value_cents clipped to the group's exact [p10, p90] discrete quantiles —
    quantile via the no-colocation histogram path, the O(groups) clip
    bounds broadcast back, exact int64 clipped sums, ONE float division,
    1e-8 floor.  Composes three existing engines; event rows never
    shuffle."""
    from ..functions.joins import lookup_join
    from ..stages.aggregates import _grouped_order_stats, partial_grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    ).materialize()
    # BOTH cut points resolve in ONE shared refinement walk (two rank slots
    # over the same per-round histogram stream) — two independent
    # grouped_quantile_histogram calls would double the wide passes
    # (the q_time_to_convert 42s→7s lesson)
    _, done = _grouped_order_stats(
        ds, key_col="event_type", value_col="v",
        rank_fns=[lambda n: -(-(1 * n) // 10) - 1,   # p10: ceil(n/10)−1
                  lambda n: -(-(9 * n) // 10) - 1],  # p90
    )
    keys = sorted(done)
    bounds = pa.table({
        "event_type": pa.array(keys),
        "lo": pa.array([done[k][0] for k in keys], pa.int64()),
        "hi": pa.array([done[k][1] for k in keys], pa.int64()),
    })
    j = lookup_join(ds, bounds, left_keys=["event_type"], how="inner")

    def clip(b: pa.Table) -> pa.Table:
        w = pc.min_element_wise(
            pc.max_element_wise(b.column("v"), b.column("lo")),
            b.column("hi"),
        )
        return pa.Table.from_pydict(
            {"event_type": b.column("event_type"), "w": w}
        )

    sums = partial_grouped_agg(
        j.map_batches(clip, batch_format="pyarrow"),
        ["event_type"], sums={"w": "s"}, count_alias="n",
    )

    def fin(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "event_type": b.column("event_type"),
            "wmean": pa.array(np.floor(s / n * 1e8) / 1e8, pa.float64()),
        })

    return sums.map_batches(fin, batch_format="pyarrow")


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (the
    behavioral-diversity / data-curation metric): H = ln(n) − Σc·ln(c)/n
    from map-side-combined (user, type) count partials — raw events never
    shuffle; the per-user term table is O(users × types).  Floored to 1e-4
    cells (ln is transcendental — the floor4 convention the quality score
    established; both engines' lns agree to ~1 ulp)."""
    from ..stages.aggregates import partial_grouped_agg

    counts = partial_grouped_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        ["user_id", "event_type"], count_alias="cnt",
    )

    def terms(b: pa.Table) -> pa.Table:
        c = b.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "user_id": b.column("user_id"),
            "cnt": b.column("cnt"),
            "_clnc": pa.array(c * np.log(c), pa.float64()),
        })

    sums = partial_grouped_agg(
        counts.map_batches(terms, batch_format="pyarrow"),
        ["user_id"], sums={"cnt": "n", "_clnc": "s"},
    )

    def entropy(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("s").to_numpy(zero_copy_only=False)
        h = np.log(n) - s / n
        return pa.Table.from_pydict({
            "user_id": b.column("user_id"),
            "entropy_r": pa.array(np.floor(h * 1e4) / 1e4, pa.float64()),
        })

    return sums.map_batches(entropy, batch_format="pyarrow")


def q_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics staple): cohort = a
    user's first active day, one row per (cohort_day, days_since) with the
    distinct-user count.  The epoch-day key is monotone in ts, so the
    cohort is ONE grouped MIN over an int column (map-side combined);
    activity is the distinct (user, day) set; the O(users) cohort table
    broadcasts back; the final count is O(cohorts × days).  Event rows
    never shuffle."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import partial_grouped_agg

    def ym_map(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        ym = pc.divide(us, 86_400_000_000)  # epoch days (int floor-div ≥ 0)
        return pa.Table.from_pydict({"user_id": b.column("user_id"), "ym": ym})

    e = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(ym_map, batch_format="pyarrow")
    cohort = partial_grouped_agg(e, ["user_id"], mins={"ym": "cym"})
    from ..stages.aggregates import distinct_keys

    activity = distinct_keys(e, ["user_id", "ym"])
    j = adaptive_join(activity, cohort, left_keys=["user_id"], how="inner")

    def since(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "cohort_day": b.column("cym"),
            "days_since": pc.subtract(b.column("ym"), b.column("cym")),
        })

    return partial_grouped_agg(
        j.map_batches(since, batch_format="pyarrow"),
        ["cohort_day", "days_since"], count_alias="n_users",
    )


def q_time_to_convert(sf_dir: str):
    """Funnel latency quantiles: among converted users (first view < first
    click < first purchase), the p50/p90 of purchase−view in microseconds —
    exact discrete quantiles via the no-colocation histogram refinement
    over the O(users) delta set.  First-step times come from the shared
    ``_funnel_first_times`` (the same definition q_funnel uses)."""
    steps = _FUNNEL_STEPS
    mins = _funnel_first_times(sf_dir, steps)

    def deltas(b: pa.Table) -> pa.Table:
        t1, t2, t3 = (b.column(f"t_{s}") for s in steps)
        ok = pc.fill_null(
            pc.and_(pc.less(t1, t2), pc.less(t2, t3)), False
        )
        d = pc.subtract(t3, t1).filter(ok)
        return pa.Table.from_pydict({
            "k": pa.array(["all"] * len(d), pa.string()), "delta": d,
        })

    # materialize the O(converted users) delta set ONCE: each histogram
    # round streams its input again, and a lazy pipeline would re-run the
    # whole funnel aggregation per round (measured 42 s unmaterialized);
    # both ranks resolve in ONE shared refinement walk
    from ..stages.aggregates import _grouped_order_stats

    dds = mins.map_batches(deltas, batch_format="pyarrow").materialize()
    _, done = _grouped_order_stats(
        dds, key_col="k", value_col="delta",
        rank_fns=[lambda n: -(-(1 * n) // 2) - 1,
                  lambda n: -(-(9 * n) // 10) - 1],
    )
    p50, p90 = done["all"]
    return pa.table({
        "p50_us": pa.array([p50], pa.int64()),
        "p90_us": pa.array([p90], pa.int64()),
    })


def q_latest_event(sf_dir: str):
    """Keep-latest dedup (the CDC/upsert compaction shape): each user's most
    recent event row via grouped_topk k=1 over the hash exchange — exact
    row_number-over-partition semantics, no per-group Python."""
    from ..stages.aggregates import grouped_topk

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts"],
    )
    return grouped_topk(
        ds, ["user_id"], value_col="ts", tiebreak_cols=["event_id"], k=1
    )


def q_full_outer(sf_dir: str):
    """FULL OUTER join of two per-user event aggregates with disjoint user
    slices (user_id < 100 vs user_id >= 50) — both null directions really
    occur.  Left-preserving adaptive join ∪ right-exclusive anti pass."""
    from ..functions.joins import full_outer_join
    from ..stages.aggregates import partial_grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    # both sides are O(users) aggregates consumed by BOTH outer-join passes
    # (left-preserving + right-exclusive): materialize once so the events
    # scan/agg doesn't re-execute per union branch
    lo = partial_grouped_agg(
        ev.filter(expr="user_id < 100"), ["user_id"], count_alias="n_lo"
    ).materialize()
    hi = (
        partial_grouped_agg(
            ev.filter(expr="user_id >= 50"), ["user_id"], count_alias="n_hi"
        )
        .map_batches(
            lambda b: b.rename_columns(["uid", "n_hi"]), batch_format="pyarrow"
        )
        .materialize()
    )
    out = full_outer_join(lo, hi, left_keys=["user_id"], right_keys=["uid"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": b.column("user_id"),
                "n_lo": pc.fill_null(pc.cast(b.column("n_lo"), pa.int64()), -1),
                "n_hi": pc.fill_null(pc.cast(b.column("n_hi"), pa.int64()), -1),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_top_terms_sketch(sf_dir: str):
    """Heavy-hitter scale path: bounded per-block summaries + exact recount
    of the pruned candidate set — provably identical output to q_top_terms."""
    from ..stages.textops import top_terms_sketch

    return top_terms_sketch(_docs(sf_dir, ["text"]), k=50)


def q_tfidf(sf_dir: str):
    """Per-(doc, term) TF-IDF: per-block tf group_by, map-side-combined df,
    df broadcast-joined back; rational score (no libm log) for bit-exact
    SQL parity."""
    import pyarrow.parquet as pq

    from ..stages.textops import tfidf_scores

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return tfidf_scores(_docs(sf_dir, ["doc_id", "text"]), n_docs)


def q_mad(sf_dir: str):
    """Per-user Median Absolute Deviation of event value-cents (robust
    dispersion): exact discrete medians both passes, deviations mapped via
    a broadcast lookup — no shuffle between the quantile exchanges."""
    from ..stages.aggregates import grouped_mad

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").select(["user_id", "v"]),
        batch_format="pyarrow",
    )
    return grouped_mad(ds, key_col="user_id", value_col="v", out_col="mad")


def q_weighted_median(sf_dir: str):
    """Per-returnflag exact lower WEIGHTED median of extendedprice cents,
    weighted by quantity cents: distinct (key, value) weight collapse
    (map-side combine) → hash-exchange run scan; 2·cumW ≥ totW picked in
    exact integers."""
    from ..stages.aggregates import grouped_weighted_median

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).map_batches(
        lambda b: _cents(_cents(b, "l_extendedprice", "v"), "l_quantity", "w")
        .select(["l_returnflag", "v", "w"]),
        batch_format="pyarrow",
    )
    return grouped_weighted_median(
        ds, key_col="l_returnflag", value_col="v", weight_col="w",
        out_col="wmedian_cents",
    )


def q_outliers_iqr(sf_dir: str):
    """Per-user Tukey-fence outlier counts over event value-cents: exact
    discrete quartiles (quantile_disc positioning) → broadcast fences →
    map-side-combined counts; the fence compare is exact-integer
    (2v vs 2·Q1 − 3·IQR) so boundary rows cannot drift from SQL."""
    from ..stages.aggregates import grouped_iqr_outliers

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").select(["user_id", "v"]),
        batch_format="pyarrow",
    )
    return grouped_iqr_outliers(
        ds, key_col="user_id", value_col="v", out_col="n_outliers"
    )


def q_unpivot(sf_dir: str):
    """UNPIVOT/melt of four lineitem measures into long form (bounded
    order slice): one column-slice concat per measure inside the map —
    rows never shuffle, no per-row Python."""
    from ..stages.aggregates import melt

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    ).filter(expr="l_orderkey < 2000")

    def cents_all(b: pa.Table) -> pa.Table:
        for src, out in [("l_quantity", "quantity_cents"),
                         ("l_extendedprice", "extendedprice_cents"),
                         ("l_discount", "discount_cents"),
                         ("l_tax", "tax_cents")]:
            b = _cents(b, src, out)
        return b.select(["l_orderkey", "l_linenumber", "quantity_cents",
                         "extendedprice_cents", "discount_cents",
                         "tax_cents"])

    return melt(
        ds.map_batches(cents_all, batch_format="pyarrow"),
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["quantity_cents", "extendedprice_cents",
                    "discount_cents", "tax_cents"],
        var_col="measure",
        value_col="cents",
    )


def q_table_diff(sf_dir: str):
    """Snapshot change detection (SCD/CDC shape) between two derived
    order versions: old = keys % 5 ≠ 0; new = keys % 3 ≠ 0 with price
    bumped +100 cents on even keys → added/removed/changed/unchanged per
    key with old/new prices; one full-outer exchange + vectorized
    IS-DISTINCT-FROM classification."""
    from ..functions.joins import table_diff

    base = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: _cents(b, "o_totalprice", "price_cents").select(
            ["o_orderkey", "price_cents"]
        ),
        batch_format="pyarrow",
    )
    def mod_ne(col: str, m: int):
        def f(b: pa.Table) -> pa.Table:
            k = b.column(col)
            rem = pc.subtract(
                k, pc.multiply(pc.divide(k, pa.scalar(m, pa.int64())),
                               pa.scalar(m, pa.int64()))
            )
            return b.filter(pc.not_equal(rem, pa.scalar(0, pa.int64())))
        return f

    old = base.map_batches(mod_ne("o_orderkey", 5), batch_format="pyarrow")

    def bump(b: pa.Table) -> pa.Table:
        even = pc.equal(
            pc.bit_wise_and(b.column("o_orderkey"), pa.scalar(1, pa.int64())),
            pa.scalar(0, pa.int64()),
        )
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "price_cents": pc.add(
                b.column("price_cents"),
                pc.if_else(even, pa.scalar(100, pa.int64()),
                           pa.scalar(0, pa.int64())),
            ),
        })

    new = base.map_batches(
        mod_ne("o_orderkey", 3), batch_format="pyarrow"
    ).map_batches(bump, batch_format="pyarrow")
    return table_diff(
        old, new, keys=["o_orderkey"], compare_cols=["price_cents"]
    )


def q_value_p90(sf_dir: str):
    """Exact per-type discrete p90 of event value-cents (quantile_disc 0.9
    positioning, exact rational index arithmetic)."""
    from ..stages.aggregates import grouped_quantile

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").select(
            ["event_type", "value_cents"]
        ),
        batch_format="pyarrow",
    )
    return grouped_quantile(
        ds, key_col="event_type", value_col="value_cents",
        q_num=9, q_den=10, out_col="p90_cents",
    )


def q_value_p90_hist(sf_dir: str):
    """Same exact p90 as q_value_p90 but through the SCALE path: iterative
    histogram refinement — no group colocation, map-side-combined
    (key, bin) counts, cents-range brackets converge in 2 rounds."""
    from ..stages.aggregates import grouped_quantile_histogram

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").select(
            ["event_type", "value_cents"]
        ),
        batch_format="pyarrow",
    )
    return grouped_quantile_histogram(
        ds, key_col="event_type", value_col="value_cents",
        q_num=9, q_den=10, out_col="p90_cents",
    )


def q_corr_qty_price(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extendedprice —
    exact int64 sum partials through the exchange, the r division is the
    only float op, mirrored bit-for-bit by HUGEINT SQL arithmetic."""
    from ..stages.aggregates import grouped_corr

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda b: pa.Table.from_pydict({
            "l_returnflag": b.column("l_returnflag"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            "price_cents": _cents(b, "l_extendedprice", "pc_").column("pc_"),
        }),
        batch_format="pyarrow",
    )
    return grouped_corr(
        ds, key_col="l_returnflag", x_col="qty", y_col="price_cents",
    )


def q_user_journey(sf_dir: str):
    """Ordered string_agg per user: the '>'-joined event_type path in
    (ts, event_id) order — one ListArray re-window + binary_join per block
    after the key-colocating sort."""
    from ..stages.windows import grouped_string_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    return grouped_string_agg(
        ds, key_col="user_id", value_col="event_type",
        order_cols=["ts", "event_id"], sep=">", out_col="journey",
    )


def q_mode_per_user(sf_dir: str):
    """Per-user modal event_type (grouped argmax): map-side (user, type)
    count partials, then grouped top-1 with a deterministic ascending-type
    tiebreak — never ships raw event rows through the exchange."""
    from ..stages.aggregates import grouped_topk, partial_grouped_agg

    counts = partial_grouped_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        ["user_id", "event_type"],
        count_alias="n",
    )
    top = grouped_topk(
        counts, ["user_id"], value_col="n",
        tiebreak_cols=["event_type"], k=1,
    )
    return top.select_columns(["user_id", "event_type", "n"]).rename_columns(
        {"event_type": "mode_type", "n": "n_events"}
    )


def q_profile_events(sf_dir: str):
    """Single-pass column profile of the events table (Deequ/TFDV shape):
    per numeric column, row count / null count / min / max from one scan —
    O(columns × blocks) partials, never a per-column re-read."""
    from ..stages.aggregates import profile_numeric

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).map_batches(
        lambda b: pa.Table.from_pydict({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "value_cents": _cents(b, "value", "vc").column("vc"),
        }),
        batch_format="pyarrow",
    )
    return profile_numeric(ds, ["event_id", "user_id", "ts_us", "value_cents"])


def q_value_median_cont(sf_dir: str):
    """Interpolated (percentile_cont) per-type median of value_cents via the
    histogram scale path: both bracketing order statistics resolve as two
    slots of one shared refinement walk; the q=1/2 blend is dyadic, so the
    float64 result is bit-identical to DuckDB quantile_cont."""
    from ..stages.aggregates import grouped_quantile_cont

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").select(
            ["event_type", "value_cents"]
        ),
        batch_format="pyarrow",
    )
    return grouped_quantile_cont(
        ds, key_col="event_type", value_col="value_cents",
        q_num=1, q_den=2, out_col="median_cents_cont",
    )


def q_event_lag_delta(sf_dir: str):
    """Per-user lag window: value_cents - lag(value_cents) over
    (PARTITION BY user_id ORDER BY ts, event_id) → (event_id, delta_cents);
    first event per user is null."""
    from ..stages.windows import grouped_lag

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_lag(
        ds, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value_cents", out_col="delta_cents", id_cols=["event_id"],
    )


def q_transition_matrix(sf_dir: str):
    """Per-user event-type transition counts (Markov / journey matrix):
    lead() over (user, ts, event_id) pairs counted — key-only range sort,
    in-block shift, map-side-combined count."""
    from ..stages.windows import grouped_transitions

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return grouped_transitions(
        ds, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="event_type",
    )


def q_cumulative_distinct(sf_dir: str):
    """Running distinct count: per event, how many distinct event_types
    its user has seen so far ((ts, event_id) order) — hash-exchange key
    colocation + two vectorized in-block passes (first-occurrence lexsort
    flags, per-run cumsum)."""
    from ..stages.windows import grouped_cumulative_distinct

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return grouped_cumulative_distinct(
        ds, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="event_type", id_col="event_id",
    )


def q_rank_windows(sf_dir: str):
    """Four ranking windows in one colocated pass: per event_type, RANK /
    DENSE_RANK over value_cents, NTILE(4) and a ROWS-frame running sum over
    the (value_cents, event_id) total order → one row per event."""
    from ..stages.windows import grouped_rank

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_rank(
        ds, key_col="event_type", value_col="value_cents",
        id_col="event_id", ntile_k=4,
    )


def q_dist_windows(sf_dir: str):
    """Distribution windows from the SAME single colocated pass as the
    ranking family: PERCENT_RANK, CUME_DIST (both floored to 1e-8 cells so
    engine doubles hash identically), FIRST_VALUE/LAST_VALUE over the
    (value, id) total order with the full ROWS frame."""
    from ..stages.windows import grouped_rank

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "value_cents").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_rank(
        ds, key_col="event_type", value_col="value_cents",
        id_col="event_id", ntile_k=4, extended=True,
    ).select_columns(["event_id", "pct_rnk", "cume", "fv", "lv"])


def q_skewness(sf_dir: str):
    """Per-event-type population skewness from exact int64 power-sum
    partials (see grouped_skewness) — floats only at the final
    sqrt/multiply/divide, mirrored HUGEINT expression as the oracle."""
    from ..stages.aggregates import grouped_skewness

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_skewness(ds, key_col="event_type", value_col="v")


def q_minmax_norm(sf_dir: str):
    """Per-row min-max normalization within its event_type — (x − min) /
    (max − min) from exact int64 grouped min/max partials broadcast back;
    numerator and denominator are exact int64 differences, ONE float
    division per row, 1e-8 floor; constant groups → null."""
    from ..functions.joins import lookup_join
    from ..stages.aggregates import partial_grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    mm = pa.Table.from_pylist(partial_grouped_agg(
        ds, ["event_type"], mins={"v": "lo"}, maxs={"v": "hi"}
    ).take_all())
    j = lookup_join(ds, mm, left_keys=["event_type"], how="inner")

    def norm(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        span = (hi - lo).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.floor((v - lo).astype(np.float64) / span * 1e8) / 1e8
        z[span == 0] = np.nan
        return pa.Table.from_pydict({
            "event_id": b.column("event_id"),
            "mmn": pa.array(z, pa.float64(), from_pandas=True),
        })

    return j.map_batches(norm, batch_format="pyarrow")


def q_weighted_avg(sf_dir: str):
    """Per-flag quantity-weighted average price: exact int64 Σ(w·v) and Σw
    partials through the combined exchange, ONE float division, 1e-8
    floor — the weighted-mean shape every mixing pipeline needs."""
    from ..stages.aggregates import partial_grouped_agg

    def prods(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "p")
        q = pc.cast(b.column("l_quantity"), pa.int64())
        return pa.Table.from_pydict({
            "l_returnflag": b.column("l_returnflag"),
            "_w": q,
            "_wv": pc.multiply_checked(q, b.column("p")),
        })

    sums = partial_grouped_agg(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ).map_batches(prods, batch_format="pyarrow"),
        ["l_returnflag"], sums={"_w": "sw", "_wv": "swv"},
    )

    def fin(b: pa.Table) -> pa.Table:
        swv = b.column("swv").to_numpy(zero_copy_only=False).astype(np.float64)
        sw = b.column("sw").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "l_returnflag": b.column("l_returnflag"),
            "wavg_cents": pa.array(np.floor(swv / sw * 1e8) / 1e8,
                                   pa.float64()),
        })

    return sums.map_batches(fin, batch_format="pyarrow")


def q_zscore(sf_dir: str):
    """Per-event z-score of value_cents within its event_type — exact int64
    sum partials, one O(groups) factor table broadcast back, one float
    multiply per row (see grouped_zscore); floored to 1e-6 cells so the
    HUGEINT-sum SQL mirror hashes identically."""
    from ..stages.aggregates import grouped_zscore

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_zscore(
        ds, key_col="event_type", value_col="v", id_col="event_id"
    )


def q_case_bucket(sf_dir: str):
    """Conditional bucketing (CASE WHEN): orders classified by total price
    into small/mid/big, counted and summed per bucket."""
    import numpy as np

    from ..stages.aggregates import partial_grouped_agg

    def bucketize(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "price_cents")
        cents = b.column("price_cents").to_numpy(zero_copy_only=False)
        lab = np.where(cents < 10_000_00, "small",
                       np.where(cents < 25_000_00, "mid", "big"))
        return pa.Table.from_pydict({
            "bucket": pa.array(lab, pa.string()),
            "price_cents": b.column("price_cents"),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    ).map_batches(bucketize, batch_format="pyarrow")
    return partial_grouped_agg(
        ds, ["bucket"], sums={"price_cents": "sum_cents"}, count_alias="n_orders"
    )


def q_revenue_by_nation(sf_dir: str):
    """Multi-way join + aggregate (TPC-H Q5 shape): lineitem ⋈ orders ⋈
    customer ⋈ nation → revenue per nation.  Revenue in exact integer
    micro-units: cents(extendedprice) × (100 − pct(discount)).  Every join
    is the fact stream against a broadcast-or-shuffle unique-keyed map
    (adaptive_join picks per side size)."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import partial_grouped_agg

    def li_prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "l_extendedprice", "price_cents")
        b = _cents(b, "l_discount", "disc_pct")
        rev = pc.multiply(
            b.column("price_cents"),
            pc.subtract(pa.scalar(100, pa.int64()), b.column("disc_pct")),
        )
        return pa.Table.from_pydict(
            {"l_orderkey": b.column("l_orderkey"), "rev_micro": rev}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    t = adaptive_join(li, orders, left_keys=["l_orderkey"],
                      right_keys=["o_orderkey"], how="inner")
    t = adaptive_join(t, customer, left_keys=["o_custkey"],
                      right_keys=["c_custkey"], how="inner")
    t = adaptive_join(t, nation, left_keys=["c_nationkey"],
                      right_keys=["n_nationkey"], how="inner")
    return partial_grouped_agg(
        t.select_columns(["n_name", "rev_micro"]), ["n_name"],
        sums={"rev_micro": "revenue_micro"}, count_alias="n_items",
    )


def q_order_priority(sf_dir: str):
    """EXISTS shape (TPC-H Q4 adapted to this schema): orders with at least
    one discounted lineitem (l_discount > 0.05), counted per priority.  The
    existence set is a shuffle-free distinct-key build over the filtered
    fact table, broadcast into a semi-join."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys, partial_grouped_agg

    disc_keys = distinct_keys(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_discount"])
        .filter(expr="l_discount > 0.05")
        .select_columns(["l_orderkey"]),
        ["l_orderkey"],
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    semi = adaptive_join(orders, disc_keys, left_keys=["o_orderkey"],
                         right_keys=["l_orderkey"], how="inner")
    return partial_grouped_agg(
        semi.select_columns(["o_orderpriority"]), ["o_orderpriority"],
        count_alias="n_orders",
    )


def q_status_pivot(sf_dir: str):
    """Conditional aggregation / pivot shape: per order priority, total
    price (exact integer cents) split into per-status columns with
    vectorized CASE masks — one pass, map-side combined."""
    from ..stages.aggregates import partial_grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        b = _cents(b, "o_totalprice", "cents")
        st = b.column("o_orderstatus")
        cents = b.column("cents")
        zero = pa.scalar(0, pa.int64())
        out = {"o_orderpriority": b.column("o_orderpriority")}
        for status, col in (("F", "total_f"), ("O", "total_o"), ("P", "total_p")):
            out[col] = pc.if_else(pc.equal(st, status), cents, zero)
        return pa.Table.from_pydict(out)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")
    return partial_grouped_agg(
        orders, ["o_orderpriority"],
        sums={"total_f": "total_f", "total_o": "total_o", "total_p": "total_p"},
        count_alias="n_orders",
    )


def q_above_avg(sf_dir: str):
    """Scalar-subquery shape: events whose value exceeds the global mean,
    counted per type.  The mean comparison is EXACT integer math (no float
    summation-order divergence): cents(value) * N > sum(cents(value)) —
    the global (sum, count) pair is one tiny driver aggregate broadcast
    into the filter."""
    from ..stages.aggregates import partial_grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = ev.map_batches(
        lambda b: _cents(b, "value", "vc").select(["event_type", "vc"]),
        batch_format="pyarrow",
    ).materialize()
    agg = cents.aggregate(Sum("vc", alias_name="s"), Count(alias_name="n"))
    s, n = int(agg["s"]), int(agg["n"])

    def above(b: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(b.column("vc"), pa.scalar(n, pa.int64())),
                          pa.scalar(s, pa.int64()))
        return b.filter(keep)

    return partial_grouped_agg(
        cents.map_batches(above, batch_format="pyarrow").select_columns(["event_type"]),
        ["event_type"], count_alias="n_events",
    )


def q_hopping_window(sf_dir: str):
    """Overlapping (hopping) 60-minute windows hopping every 15 minutes:
    per-window per-type event counts — the streaming-window shape tumbling
    buckets can't express (each event lands in 4 windows)."""
    from ..stages.windows import hopping_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return hopping_counts(ds, width_minutes=60, hop_minutes=15)


def q_ols_per_flag(sf_dir: str):
    """Per-returnflag OLS regression of extendedprice-cents on quantity —
    exact int64 sum partials (hi/lo splits) through the exchange; slope
    and intercept are each ONE float division of two exact integers,
    mirrored bit-for-bit by HUGEINT SQL arithmetic."""
    from ..stages.aggregates import grouped_ols

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda b: pa.Table.from_pydict({
            "l_returnflag": b.column("l_returnflag"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            "price_cents": _cents(b, "l_extendedprice", "pc_").column("pc_"),
        }),
        batch_format="pyarrow",
    )
    return grouped_ols(
        ds, key_col="l_returnflag", x_col="qty", y_col="price_cents",
    )


def q_containment(sf_dir: str):
    """Asymmetric near-containment join on a bounded slice (doc_id < 500;
    the hot-vocabulary caveat of q_ngram_jaccard_1k applies — the slice
    bound is part of the query name contract's oracle too): ordered pairs
    where ≥55% of doc a's 5-byte shingles appear in doc b — the
    quote/inclusion relation symmetric Jaccard misses.  Exact one-sided
    prefix filter + shared-index verify (stages/dedup.py::
    ngram_containment_join)."""
    from ..stages.dedup import ngram_containment_join

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") < 500,
    )
    return ngram_containment_join(docs, threshold=0.55, k=5)


def q_resample_locf(sf_dir: str):
    """Fixed-grid resample with last-observation-carried-forward: every
    (user < 100) × 6-hour grid mark gets the value of that user's latest
    event at-or-before the mark (null before the first event) — the
    time-series regularization pass feature stores run.  Grid bounds come
    from one distributed min/max, the user×mark cross product builds
    per-block from a broadcastable mark vector, and the fill is the
    existing distributed as-of join; all-integer epoch-us arithmetic →
    bit-exact vs the SQL oracle."""
    from ray.data.aggregate import Max, Min

    from ..stages.aggregates import distinct_keys
    from ..stages.temporal import asof_join

    STEP = 6 * 3600 * 1_000_000
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
        filter=pc.field("user_id") < 100,
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "ets_us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
            "locf_cents": _cents(b, "value", "vc").column("vc"),
        }),
        batch_format="pyarrow",
    ).materialize()
    agg = ev.aggregate(Min("ets_us"), Max("ets_us"))
    lo = (int(agg["min(ets_us)"]) // STEP) * STEP
    hi = int(agg["max(ets_us)"])
    marks = np.arange(lo, hi + 1, STEP, dtype=np.int64)

    def cross(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(np.repeat(u, marks.size), pa.int64()),
            "ts_us": pa.array(np.tile(marks, u.size), pa.int64()),
        })

    grid = distinct_keys(
        ev.select_columns(["user_id"]), ["user_id"]
    ).map_batches(cross, batch_format="pyarrow")
    return asof_join(
        grid, ev,
        left_key="user_id", right_key="user_id",
        left_ts="ts_us", right_ts="ets_us",
        right_cols=["locf_cents"], right_order="event_id",
    )


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence-packing manifest at context length 512: docs
    concatenate in doc_id order into one global token stream (exclusive
    offsets from the distributed block-offset prefix sum), each doc's span
    explodes into the sequences it touches (vectorized ragged arange), and
    per-sequence stats reduce with map-side partials.  The manifest a
    training exporter writes before cutting fixed-length rows; all-integer
    → bit-exact vs the SQL window + generate_series oracle."""
    from ..stages.temporal import _ragged_arange
    from ..stages.textops import add_token_count
    from ..stages.windows import ordered_prefix_sum
    from ..stages.aggregates import partial_grouped_agg

    L = 512
    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    run = ordered_prefix_sum(
        docs, order_col="doc_id", value_col="n_tokens", out_col="cum"
    )

    def explode(b: pa.Table) -> pa.Table:
        cum = b.column("cum").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        off = cum - n
        keep = n > 0
        off, cum, ids = off[keep], cum[keep], ids[keep]
        row, seq = _ragged_arange(off // L, (cum - 1) // L + 1)
        tok = (np.minimum(cum[row], (seq + 1) * L)
               - np.maximum(off[row], seq * L))
        return pa.table({
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(ids[row], pa.int64()),
            "tok": pa.array(tok, pa.int64()),
        })

    return partial_grouped_agg(
        run.map_batches(explode, batch_format="pyarrow"),
        ["seq"],
        sums={"tok": "n_tokens"},
        mins={"doc_id": "first_doc"},
        maxs={"doc_id": "last_doc"},
        count_alias="n_docs",
    )


def q_interval_coverage(sf_dir: str):
    """Per-user busy-time (interval-union) coverage: each event opens the
    interval [ts, ts + value-cents seconds]; overlapping-or-touching
    intervals merge into islands (one hash exchange + segmented-cummax
    island scan, stages/temporal.py::interval_coverage).  All-integer
    epoch-us arithmetic → bit-exact vs the SQL window oracle."""
    from ..stages.temporal import interval_coverage

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "s": pc.cast(b.column("ts"), pa.int64()),
            "e": pc.add_checked(
                pc.cast(b.column("ts"), pa.int64()),
                pc.multiply_checked(
                    _cents(b, "value", "vc").column("vc"), 1_000_000
                ),
            ),
        }),
        batch_format="pyarrow",
    )
    return interval_coverage(ds, key_col="user_id", start_col="s", end_col="e")


def q_clustering_coeff(sf_dir: str):
    """Per-node local clustering coefficient over the derived doc graph:
    top-20 by cc = 2·T(v)/(deg·(deg−1)).  Triangle credits come from the
    shared degree-ordered wedge enumeration (one hash exchange + one join,
    no adjacency materialization); cc is one float division of exact ints,
    mirrored bit-for-bit by the SQL oracle."""
    from ..stages.graph_query import local_clustering

    cc = local_clustering(_derived_doc_edges(sf_dir))
    return cc.sort(["cc", "node"], descending=[True, False]).limit(20)


def q_pmi_bigrams(sf_dir: str):
    """Collocation extraction (tokenizer/vocab-building corpus statistic):
    top-20 adjacent-word bigrams by the PMI ratio c_xy·N / (c_x·c_y) with
    min count 5.  Bigram and unigram counts are map-side-combined integer
    partials; the tiny unigram table broadcasts into the bigram table
    (adaptive_join); the ratio is ONE float division whose operands are
    exact products < 2⁵³ (asserted), so the SQL HUGEINT→DOUBLE oracle
    yields bit-identical doubles and an identical ordering."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import partial_grouped_agg

    def toks_flat(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), pattern=" ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return pa.table({"w": flat})

    def bigram_pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        total = int(lens.sum())
        ends = np.cumsum(lens)
        left = np.ones(total, bool)
        left[ends - 1] = False
        li = np.flatnonzero(left)
        return pa.table({
            "w1": flat.take(pa.array(li, pa.int64())),
            "w2": flat.take(pa.array(li + 1, pa.int64())),
        })

    docs = _docs(sf_dir, ["doc_id", "text"])
    uni = partial_grouped_agg(
        docs.map_batches(toks_flat, batch_format="pyarrow"),
        ["w"], count_alias="c",
    )
    bg = partial_grouped_agg(
        docs.map_batches(bigram_pairs, batch_format="pyarrow"),
        ["w1", "w2"], count_alias="n",
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), 5)),
        batch_format="pyarrow",
    )
    n_tok = int(uni.aggregate(Sum("c"))["sum(c)"])

    def _ren(side: str):
        return lambda b: pa.Table.from_arrays(
            [b.column("w"), b.column("c")], names=[side, f"c_{side}"]
        )

    j = adaptive_join(
        bg, uni.map_batches(_ren("w1"), batch_format="pyarrow"),
        left_keys=["w1"], right_keys=["w1"], how="inner",
    )
    j = adaptive_join(
        j, uni.map_batches(_ren("w2"), batch_format="pyarrow"),
        left_keys=["w2"], right_keys=["w2"], how="inner",
    )

    def score(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = b.column("c_w1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = b.column("c_w2").to_numpy(zero_copy_only=False).astype(np.float64)
        # both products must be exactly representable for bit parity with
        # the SQL HUGEINT→DOUBLE oracle (one correctly-rounded division)
        assert (n.size == 0 or
                (n.max() * n_tok < 2**53 and (c1 * c2).max() < 2**53))
        bigram = pc.binary_join_element_wise(
            b.column("w1"), b.column("w2"), " "
        )
        return pa.table({
            "bigram": bigram,
            "n": b.column("n"),
            "pmi_ratio": pa.array((n * float(n_tok)) / (c1 * c2), pa.float64()),
        })

    return j.map_batches(score, batch_format="pyarrow").sort(
        ["pmi_ratio", "bigram"], descending=[True, False]
    ).limit(20)


def q_cooccur_parts(sf_dir: str):
    """Market-basket co-occurrence: top-20 part pairs by the number of
    orders containing both (the co-occurrence-graph edge-weight build).
    One hash exchange colocates each order's lineitems, pair emission is
    the vectorized triangular-inversion kernel, counts are map-side
    partials; all-integer → bit-exact vs the SQL self-join oracle."""
    from ..stages.aggregates import cooccurrence_pairs

    pairs = cooccurrence_pairs(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ),
        group_col="l_orderkey", item_col="l_partkey",
        out_a="part_a", out_b="part_b", count_col="n",
        max_items_per_group=None,  # oracle is an uncapped SQL self-join
    )
    return pairs.sort(
        ["n", "part_a", "part_b"], descending=[True, False, False]
    ).limit(20)


def q_basket_lift(sf_dir: str):
    """Association-rule lift: top-20 part pairs by
    lift = n_ab·N_orders / (n_a·n_b) among pairs co-bought ≥ 2 times —
    the scoring pass over the co-occurrence graph (composition of
    cooccurrence_pairs + distinct item counts + broadcast joins).  The
    float lift is ONE division of exact integer products < 2⁵³ (asserted),
    bit-identical to the SQL HUGEINT→DOUBLE oracle."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import (
        cooccurrence_pairs,
        distinct_keys,
        partial_grouped_agg,
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = cooccurrence_pairs(
        li, group_col="l_orderkey", item_col="l_partkey",
        out_a="part_a", out_b="part_b", count_col="nab",
        max_items_per_group=None,  # oracle is an uncapped SQL self-join
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("nab"), 2)),
        batch_format="pyarrow",
    )
    d = distinct_keys(li, ["l_orderkey", "l_partkey"]).materialize()
    n_orders = distinct_keys(
        d.select_columns(["l_orderkey"]), ["l_orderkey"]
    ).count()
    ic = partial_grouped_agg(
        d.select_columns(["l_partkey"]), ["l_partkey"], count_alias="c"
    )

    def _ren(side: str):
        return lambda b: pa.Table.from_arrays(
            [b.column("l_partkey"), b.column("c")],
            names=[side, f"c_{side}"],
        )

    j = adaptive_join(
        pairs, ic.map_batches(_ren("part_a"), batch_format="pyarrow"),
        left_keys=["part_a"], right_keys=["part_a"], how="inner",
    )
    j = adaptive_join(
        j, ic.map_batches(_ren("part_b"), batch_format="pyarrow"),
        left_keys=["part_b"], right_keys=["part_b"], how="inner",
    )

    def score(b: pa.Table) -> pa.Table:
        nab = b.column("nab").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = b.column("c_part_a").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = b.column("c_part_b").to_numpy(zero_copy_only=False).astype(np.float64)
        assert b.num_rows == 0 or (
            nab.max() * n_orders < 2**53 and (ca * cb).max() < 2**53
        )
        return pa.table({
            "part_a": b.column("part_a"),
            "part_b": b.column("part_b"),
            "n": pc.cast(b.column("nab"), pa.int64()),
            "lift": pa.array(nab * float(n_orders) / (ca * cb), pa.float64()),
        })

    return j.map_batches(score, batch_format="pyarrow").sort(
        ["lift", "part_a", "part_b"], descending=[True, False, False]
    ).limit(20)


def q_first_last(sf_dir: str):
    """FIRST_VALUE + LAST_VALUE + COUNT per user in ONE pass — each block
    collapses to one arg-extrema partial row per in-block user (C++
    multi-key sort + run scan), so the exchange moves O(users × blocks)
    rows instead of the event count; the associative arg-combine (min/max
    by (ts, event_id)) finishes in an adaptive zero-CPU task.  Unlike
    q_latest_event (grouped_topk ships every row), this is the map-side
    combiner shape for first/last-capture-per-URL at 100 TB."""
    from ..stages.aggregates import grouped_arg_extrema

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts"],
    )
    return grouped_arg_extrema(
        ds,
        key_col="user_id",
        order_col="ts",
        tiebreak_col="event_id",
        payload_col="event_type",
        count_alias="n_events",
    )


def q_sssp(sf_dir: str):
    """Unweighted single-source shortest paths (hop distances, ≤ 3) from
    the smallest part over the part co-occurrence graph — the first
    ORACLE-BACKED iterative graph traversal (DuckDB recursive CTE):
    cooccurrence_pairs builds the distinct edge list with map-side
    combine, then khop's broadcast-frontier BFS streams it once per round
    through an is_in semi-join — edge rows never shuffle, the exchange per
    round is O(distinct neighbors × blocks)."""
    from ..stages.aggregates import cooccurrence_pairs
    from ..stages.graph_query import khop

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    seed = int(li.min("l_partkey"))
    edges = cooccurrence_pairs(
        li, group_col="l_orderkey", item_col="l_partkey",
        out_a="part_a", out_b="part_b", count_col="n",
        max_items_per_group=None,  # oracle is an uncapped SQL self-join
    ).materialize()
    t = khop(edges, [seed], k=3, direction="both",
             src="part_a", dst="part_b")
    return t.rename_columns(["part", "dist"])


def q_harmonic_parts(sf_dir: str):
    """Harmonic centrality (exact scaled-integer Σ floor(2^40/d)) of the 5
    smallest parts over the part co-occurrence graph, radius 4 — the
    multi-seed oracle-backed companion of q_sssp: cooccurrence_pairs
    builds the distinct edge list with map-side combine; each seed runs
    harmonic_centrality's CSR level sweep / broadcast-frontier BFS
    (regime picked by edge count, exactly equal by all-integer hop math).
    Oracle: DuckDB recursive-CTE multi-seed BFS."""
    from ..stages.aggregates import cooccurrence_pairs
    from ..stages.graph_query import harmonic_centrality

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = cooccurrence_pairs(
        li, group_col="l_orderkey", item_col="l_partkey",
        out_a="part_a", out_b="part_b", count_col="n",
        max_items_per_group=None,  # oracle is an uncapped SQL self-join
    ).materialize()

    def block_min5(b: pa.Table) -> pa.Table:
        cat = pa.concat_arrays([
            b.column("part_a").combine_chunks(),
            b.column("part_b").combine_chunks(),
        ])
        u = np.unique(cat.to_numpy(zero_copy_only=False))
        return pa.table({"p": pa.array(u[:5], pa.int64())})

    cands = sorted({
        r["p"]
        for r in edges.map_batches(
            block_min5, batch_format="pyarrow"
        ).take_all()
    })
    t = harmonic_centrality(
        edges, cands[:5], max_hops=4, direction="both",
        src="part_a", dst="part_b",
    )
    return t.rename_columns(["part", "harmonic_s", "n_reachable"])


def q_skyline(sf_dir: str):
    """Pareto frontier (2-D skyline) of the part table under (retail price
    lower-better, size higher-better) — multi-objective data curation's
    selection rule (the best document at every budget).  Per-block local
    skylines (one C sort + segmented prefix-max) union into one zero-CPU
    combine; only candidates ever leave a block.  Oracle: DuckDB
    NOT-EXISTS dominance."""
    from ..stages.aggregates import skyline_2d

    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )
    return skyline_2d(
        ds, min_col="p_retailprice", max_col="p_size",
        id_cols=["p_partkey"],
    )


def q_mutual_nn(sf_dir: str):
    """Mutual top-1 nearest-neighbor pairs between the even- and odd-id
    halves of the embeddings table — the candidate rule of margin-based
    bitext mining (Artetxe & Schwenk 2019).  Exact block-pair matmul
    partials → associative arg-extrema combine (ties toward the smaller
    candidate id) → count==2 mutuality filter; cos floored at 4 decimals
    like every pairs oracle here."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def parity(b: pa.Table, want: int) -> pa.Table:
        ids = pc.cast(b.column("vec_id"), pa.int64())
        return b.filter(pc.equal(pc.bit_wise_and(ids, 1), want))

    return knn_mod.mutual_nn_pairs(
        ds.map_batches(lambda b: parity(b, 0), batch_format="pyarrow"),
        ds.map_batches(lambda b: parity(b, 1), batch_format="pyarrow"),
    )


def q_quota_sample(sf_dir: str):
    """Quality-quota (curriculum-mixing) sampling: documents bucketed by
    exact length quartiles — thresholds from ONE histogram-walk order-stats
    pass (no sort, no group colocation), broadcast as three scalars — then
    kept at per-bucket rates 5% / 20% / 50% / 100% (shortest → longest
    quartile) by the deterministic md5 id-hash predicate every sampler
    here uses.  The data-mixing primitive: reweight quality strata as a
    pure streaming filter, materializing nothing."""
    from ..stages.aggregates import _grouped_order_stats
    from ..stages.sampling import _bucket_column

    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])
    keyed = docs.map_batches(
        lambda b: pa.table({
            "_k": pa.array(np.zeros(b.num_rows, np.int64)),
            "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    _, done = _grouped_order_stats(
        keyed, key_col="_k", value_col="n_chars",
        rank_fns=[
            lambda n: -(-(1 * n) // 4) - 1,
            lambda n: -(-(2 * n) // 4) - 1,
            lambda n: -(-(3 * n) // 4) - 1,
        ],
    )
    q1, q2, q3 = done[0]
    thr = np.array([50_000, 200_000, 500_000, 1_000_000], np.uint64)

    def flt(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_chars"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bucket = (
            (n > q1).astype(np.int64) + (n > q2).astype(np.int64)
            + (n > q3).astype(np.int64)
        )
        keep = _bucket_column(b, "doc_id", "md5", "") < thr[bucket]
        t = b.filter(pa.array(keep))
        return t.append_column("bucket", pa.array(bucket[keep], pa.int64()))

    return docs.map_batches(flt, batch_format="pyarrow")


def q_keyness_chi2(sf_dir: str):
    """Distinctive-terms audit (corpus-linguistics keyness): the χ²
    statistic of every (source, term) contingency table over the token
    stream.  Counts are map-side-combined exact integers (a = c_st,
    b = c_s − a, c = c_t − a, d = N − c_s − c_t + a); term totals join
    back through adaptive_join (broadcast under the cap, hash shuffle past
    it — terms are unbounded at corpus scale), source totals and N are
    O(sources) driver scalars.  The statistic is ONE float expression with
    the SAME operand association as the SQL mirror (exact ints cast to
    double, fixed multiply order), floored at 4 decimals."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import partial_grouped_agg
    from ..stages.textops import doc_token_rows

    docs = _docs(sf_dir, ["source", "text"])
    tok = docs.map_batches(
        lambda b: doc_token_rows(b, id_col="source").rename_columns(
            ["source", "term"]
        ),
        batch_format="pyarrow",
    )
    st = partial_grouped_agg(tok, ["source", "term"], count_alias="a")
    st = st.materialize()
    tt = partial_grouped_agg(st, ["term"], sums={"a": "ct"})
    src = {
        r["source"]: r["cs"]
        for r in partial_grouped_agg(
            st, ["source"], sums={"a": "cs"}
        ).take_all()
    }
    n_total = int(sum(src.values()))
    joined = adaptive_join(st, tt, left_keys=["term"])

    def chi2(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column("a"), pa.int64()).to_numpy(zero_copy_only=False)
        ct = pc.cast(b.column("ct"), pa.int64()).to_numpy(zero_copy_only=False)
        cs = np.array(
            [src[s] for s in b.column("source").to_pylist()], np.int64
        )
        d = n_total - cs - ct + a
        # both int64 products must be exact (no wrap) for bit parity with
        # the SQL HUGEINT oracle — the same <2^53 guard q_pmi_bigrams and
        # q_basket_lift apply (a*d ~ N² wraps silently past ~3e9 tokens)
        assert a.size == 0 or (
            (a.astype(np.float64) * d.astype(np.float64)).max() < 2**53
            and ((cs - a).astype(np.float64)
                 * (ct - a).astype(np.float64)).max() < 2**53
        )
        adbc = a * d - (cs - a) * (ct - a)
        num = (np.float64(n_total) * adbc.astype(np.float64)) * adbc.astype(
            np.float64
        )
        den = (
            (cs.astype(np.float64) * (n_total - cs).astype(np.float64))
            * ct.astype(np.float64)
        ) * (n_total - ct).astype(np.float64)
        chi = np.floor((num / den) * 10000.0) / 10000.0
        return pa.table({
            "source": b.column("source"),
            "term": b.column("term"),
            "chi2_r": pa.array(chi, pa.float64()),
        })

    return joined.map_batches(chi2, batch_format="pyarrow")


def q_lm_perplexity(sf_dir: str):
    """CCNet-style corpus-LM quality score per document — the classic
    training-data filter (score each doc under a language model trained on
    the corpus, drop the tail).  Every in-doc adjacent token pair (a, b)
    scores its add-one-smoothed corpus bigram likelihood
    P(b|a) = (c(a,b)+1)/(c(a)+V) in 2^20 FIXED POINT via exact integer
    division — the repo's rational log-free bit-parity rule (cf.
    tfidf_scores; cross-libm ``ln`` drifts at floor boundaries, integer
    division cannot).  Model counts (c_ab, c_a) are map-side-combined
    exact integers attached back through adaptive_join (broadcast under
    the cap — bigram types are vocabulary-bounded, not corpus-bounded;
    hash shuffle past it); V (distinct tokens) is one driver scalar.
    Per-doc output: exact int term sum + count and their float mean
    (one exactly-rounded division, floored at 4 decimals)."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys, partial_grouped_agg

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _tok_lists(b: pa.Table):
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return lens, flat

    def tok_rows(b: pa.Table) -> pa.Table:
        _, flat = _tok_lists(b)
        return pa.table({"term": flat})

    def bigram_rows(b: pa.Table) -> pa.Table:
        lens, flat = _tok_lists(b)
        total = int(lens.sum())
        ends = np.cumsum(lens)
        left = np.ones(total, bool)
        left[ends - 1] = False  # each doc's last token starts no bigram
        li = np.flatnonzero(left)
        doc_row = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        return pa.table({
            "doc_id": b.column("doc_id").take(pa.array(doc_row[li], pa.int64())),
            "a": flat.take(pa.array(li, pa.int64())),
            "b": flat.take(pa.array(li + 1, pa.int64())),
        })

    bg = docs.map_batches(bigram_rows, batch_format="pyarrow").materialize()
    cab = partial_grouped_agg(bg, ["a", "b"], count_alias="c_ab")
    ca = partial_grouped_agg(bg, ["a"], count_alias="c_a")
    v_tokens = distinct_keys(
        docs.map_batches(tok_rows, batch_format="pyarrow"), ["term"]
    ).count()
    j = adaptive_join(bg, cab, left_keys=["a", "b"])
    j = adaptive_join(j, ca, left_keys=["a"])

    scale = 1 << 20

    def term_score(b: pa.Table) -> pa.Table:
        c_ab = pc.cast(b.column("c_ab"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c_a = pc.cast(b.column("c_a"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = (c_ab + 1) * scale // (c_a + v_tokens)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "t": pa.array(t, pa.int64()),
        })

    per_doc = partial_grouped_agg(
        j.map_batches(term_score, batch_format="pyarrow"),
        ["doc_id"], sums={"t": "lm_score"}, count_alias="n_bigrams",
    )

    def finish(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("lm_score"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = pc.cast(b.column("n_bigrams"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        avg = np.floor(s / n.astype(np.float64) * 10000.0) / 10000.0
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_bigrams": pa.array(n, pa.int64()),
            "lm_score": pa.array(s, pa.int64()),
            "lm_avg_r": pa.array(avg, pa.float64()),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow")


def q_lexical_diversity(sf_dir: str):
    """Per-doc lexical-diversity quality signals: type-token ratio and
    Simpson index (1 − Σ(c_i/n)² — the repetition detector MTLD/TTR
    pipelines gate on).  A document is ONE row, so its token histogram is
    row-local: zero shuffle — one dictionary-encode of the batch's flat
    token buffer + one (doc, code) lexsort + run scan yields n_tokens /
    n_types / Σc² per doc as exact int64; the two ratios are single
    exactly-rounded float expressions floored at 4 decimals (the floor4
    convention)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def per_batch(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        codes_arr = flat.dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        doc_of = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        order = np.lexsort((codes, doc_of))
        dv, cv = doc_of[order], codes[order]
        starts = np.flatnonzero(np.r_[True, (dv[1:] != dv[:-1]) | (cv[1:] != cv[:-1])])
        run_len = np.diff(np.r_[starts, len(dv)])
        run_doc = dv[starts]
        n_types = np.bincount(run_doc, minlength=b.num_rows).astype(np.int64)
        simpson = np.zeros(b.num_rows, np.int64)
        np.add.at(simpson, run_doc, run_len * run_len)
        n = lens.astype(np.int64)
        nf = n.astype(np.float64)
        ttr = np.floor(n_types / nf * 10000.0) / 10000.0
        simp = np.floor((1.0 - simpson / (nf * nf)) * 10000.0) / 10000.0
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "simpson_num": pa.array(simpson, pa.int64()),
            "ttr_r": pa.array(ttr, pa.float64()),
            "simpson_r": pa.array(simp, pa.float64()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow")


def q_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP / time-in-state):
    Σ cents·Δt / span with Δt in whole epoch seconds to the next event
    (ORDER BY ts, event_id), exact int64 numerator and span, one float
    division; single-event / zero-span users → NULL.  Key-only range sort
    + one vectorized segment scan (grouped_lag's shape)."""
    from ..stages.windows import grouped_twap

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).map_batches(
        lambda b: _cents(b, "value", "v").drop_columns(["value"]),
        batch_format="pyarrow",
    )
    return grouped_twap(
        ds, key_col="user_id", ts_col="ts",
        order_cols=["ts", "event_id"], value_col="v", out_col="twap",
    )


def q_gini(sf_dir: str):
    """Per-event-type Gini coefficient of non-negative value cents — the
    concentration/inequality audit (who holds the mass: users, domains,
    sources).  G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ ascending; tie
    order is immaterial (equal values commute in Σ i·xᵢ), so the result is
    deterministic under any sort.  Key-only range sort colocates each type
    (grouped_twap's shape); per block one in-block C sort + two reduceats
    give exact int64 (n, Σx, Σ i·x); the division is ONE float op per key
    from exact Python ints; floor4 for layout-stable bits."""
    key = "event_type"

    def to_cents(b: pa.Table) -> pa.Table:
        b = _cents(b, "value", "v").drop_columns(["value"])
        keep = pc.and_(
            pc.is_valid(b.column("v")), pc.greater_equal(b.column("v"), 0)
        )
        return b.filter(pc.fill_null(keep, False))

    s = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=[key, "value"]
    ).map_batches(to_cents, batch_format="pyarrow").sort([key])
    out_schema = pa.schema([(key, pa.string()), ("gini_r", pa.float64())])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[(key, "ascending"), ("v", "ascending")]
        )
        block = block.take(order)
        keys_np = block.column(key).to_numpy(zero_copy_only=False)
        v = block.column("v").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, keys_np[1:] != keys_np[:-1]])
        ends = np.r_[starts[1:], n]
        cnt = ends - starts
        # per-key ascending rank 1..n_k; Σ rank·v must stay exact in int64
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, cnt) + 1
        vmax = int(v.max()) if n else 0
        assert vmax == 0 or int(cnt.max()) ** 2 * vmax < 2**63
        six = np.add.reduceat(rank * v, starts)
        sx = np.add.reduceat(v, starts)
        keep_idx: list[int] = []
        gini: list[float] = []
        for pos, (Six, S, nk) in enumerate(
            zip(six.tolist(), sx.tolist(), cnt.tolist())
        ):
            if S == 0:
                continue  # all-zero mass: Gini undefined (SQL mirror: s > 0)
            g = float(2 * Six - (nk + 1) * S) / float(nk * S)
            keep_idx.append(int(starts[pos]))
            gini.append(np.floor(g * 10000.0) / 10000.0)
        return pa.Table.from_pydict(
            {
                key: block.column(key).take(pa.array(keep_idx, pa.int64())),
                "gini_r": pa.array(gini, pa.float64()),
            },
            schema=out_schema,
        )

    return s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).sort(key)


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: exact 5-token-window Jaccard for
    every source pair — the corpus-audit op quantifying train/eval or
    crawl-snapshot overlap at shingle granularity.  Per block: exact
    window STRINGS (string_split(' ') semantics, the same window builder
    as substring_dedup's SQL mirror) → map-side distinct (source, window)
    pairs; per-source set sizes are O(sources) driver scalars;
    intersections come from cooccurrence_pairs over the window groups
    (each unordered source pair once, lexicographic); jaccard = ONE float
    division of exact ints.  At corpus scale swap the shipped strings for
    substring_dedup's 128-bit-hash + string-verify shape — this is the
    exact-oracle path."""
    from ..stages.aggregates import (
        cooccurrence_pairs, distinct_keys, partial_grouped_agg,
    )
    from ..stages.dedup import _window_strings
    from ..stages.textops import _window_token_hashes

    docs = _docs(sf_dir, ["source", "text"])
    W = 5

    def wins(b: pa.Table) -> pa.Table:
        flat, ws, wd, _ = _window_token_hashes(b.column("text"), W)
        return pa.table({
            "source": b.column("source").take(pa.array(wd, pa.int64())),
            "w": _window_strings(flat, ws, W),
        })

    dw = distinct_keys(
        docs.map_batches(wins, batch_format="pyarrow"), ["source", "w"]
    ).materialize()
    sz = {
        r["source"]: r["n"]
        for r in partial_grouped_agg(
            dw, ["source"], count_alias="n"
        ).take_all()
    }
    inter = cooccurrence_pairs(
        dw, group_col="w", item_col="source",
        out_a="src_a", out_b="src_b", count_col="n_inter",
    )

    def finish(b: pa.Table) -> pa.Table:
        ni = pc.cast(b.column("n_inter"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        na = np.array(
            [sz[s] for s in b.column("src_a").to_pylist()], np.int64
        )
        nb = np.array(
            [sz[s] for s in b.column("src_b").to_pylist()], np.int64
        )
        nu = na + nb - ni
        return pa.table({
            "src_a": b.column("src_a"), "src_b": b.column("src_b"),
            "n_inter": pa.array(ni, pa.int64()),
            "n_union": pa.array(nu, pa.int64()),
            "jaccard": pa.array(
                ni.astype(np.float64) / nu.astype(np.float64), pa.float64()
            ),
        })

    return inter.map_batches(finish, batch_format="pyarrow")


def q_mad_by_type(sf_dir: str):
    """Robust scale per event type: median absolute deviation in cents —
    median(|v − median(v)|), both medians the exact discrete
    quantile_disc(1/2); every intermediate is int64, so the result is
    partition-invariant and bit-exact with no float caveat.  Per-type
    medians are O(types) driver scalars broadcast into the deviation map;
    two grouped-median exchanges total."""
    from ..stages.aggregates import grouped_median

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda b: _cents(b, "value", "v").select(["event_type", "v"]),
        batch_format="pyarrow",
    )
    med = {
        r["event_type"]: r["med"]
        for r in grouped_median(
            ds, key_col="event_type", value_col="v", out_col="med"
        ).take_all()
    }

    def dev(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column("v"), pa.int64()).to_numpy(zero_copy_only=False)
        m = np.array(
            [med[t] for t in b.column("event_type").to_pylist()], np.int64
        )
        return pa.table({
            "event_type": b.column("event_type"),
            "av": pa.array(np.abs(v - m), pa.int64()),
        })

    return grouped_median(
        ds.map_batches(dev, batch_format="pyarrow"),
        key_col="event_type", value_col="av", out_col="mad_cents",
    )


def q_json_extract(sf_dir: str):
    """Semi-structured ETL: pull the integer ``k`` field out of the events
    table's JSON ``props`` column and aggregate per event_type.  The parse
    is O(distinct strings) — dictionary-encode each batch, json.loads each
    distinct value once, project back by take (functions/json_utils.py) —
    then map-side integer partials; bit-exact vs the SQL json_extract
    oracle."""
    from ..functions.json_utils import json_int_field
    from ..stages.aggregates import partial_grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    ).map_batches(
        lambda b: pa.Table.from_pydict({
            "event_type": b.column("event_type"),
            "k": json_int_field(b.column("props"), "k"),
        }),
        batch_format="pyarrow",
    )
    return partial_grouped_agg(
        ds, ["event_type"],
        sums={"k": "sum_k"}, mins={"k": "min_k"}, maxs={"k": "max_k"},
        count_alias="n",
    )


def q_token_commonness(sf_dir: str):
    """Corpus-statistic quality score (CCNet-filter shape, exact-integer):
    per doc, sum of each token occurrence's global corpus frequency +
    token count — two passes, broadcast term map, all-int arithmetic."""
    from ..stages.textops import token_commonness

    return token_commonness(_docs(sf_dir, ["doc_id", "text"]))


def q_decontaminate_tokens(sf_dir: str):
    """TOKEN-level benchmark decontamination (the canonical GPT-3 form:
    13 consecutive TOKENS, occurrence counts — `q_decontaminate` is the
    char-13-gram distinct-count variant): docs sharing a verbatim 13-token
    window with the "benchmark" slice (doc_id % 100 < 2 — deterministic,
    spread across the corpus) and how many windows hit.  Bench index
    broadcast once; corpus is one streaming hash-prune + exact-verify map
    pass (stages/textops.ngram_decontaminate)."""
    import ray

    from ..stages.textops import ngram_decontaminate

    def mod100(b: pa.Table) -> pa.Table:
        m = pc.subtract(
            b.column("doc_id"),
            pc.multiply(pc.divide(b.column("doc_id"), 100), 100),
        )
        return b.append_column("_m", m)

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        mod100, batch_format="pyarrow"
    ).materialize()  # one read feeds both the bench extraction and the scan
    # bench side: distributed filter, driver only ever holds the small
    # benchmark slice (never the corpus)
    bench_refs = docs.map_batches(
        lambda b: b.filter(pc.less(b.column("_m"), 2)).drop_columns(["_m"]),
        batch_format="pyarrow",
    ).to_arrow_refs()
    bench_tbls = [t for t in ray.get(bench_refs) if t.num_rows]
    bench = pa.concat_tables(bench_tbls)
    scan = docs.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("_m"), 2)
        ).drop_columns(["_m"]),
        batch_format="pyarrow",
    )
    return ngram_decontaminate(scan, bench, n=13)


_BM25_TERMS = ["join", "vector", "customer"]


def q_bm25_topk(sf_dir: str):
    """Top-10 docs by BM25 for a fixed 3-term query — the standard lexical
    retrieval scorer (stages/textops.bm25_topk): one tokenizing map pass
    (per-doc dl + per-term tf, complete per block), tiny corpus-scalar
    combine, score+per-block-topk second pass.  Pinned float expression
    tree + floor4 so the SQL mirror hashes identically."""
    from ..stages.textops import bm25_topk

    return bm25_topk(
        _docs(sf_dir, ["doc_id", "text"]), _BM25_TERMS, k=10,
    )


def q_chunk_windows(sf_dir: str):
    """Overlapping 64-token / stride-32 window chunking over the corpus —
    the RAG/embedding-prep splitter (stages/textops.chunk_token_windows):
    one tokenize + one list-slice/join kernel pair per window ordinal,
    pure streaming map."""
    from ..stages.textops import chunk_token_windows

    return chunk_token_windows(
        _docs(sf_dir, ["doc_id", "text"]), size=64, stride=32
    )


def q_token_shards(sf_dir: str):
    """Token-budget sharding (the sequence-packing / token-balanced-export
    front-end): docs in doc_id order, shard = exclusive-prefix-sum of
    n_tokens // 4096 — contiguous shards of ~equal TOKEN (not doc) count,
    built on the distributed block-offset prefix sum
    (stages/windows.ordered_prefix_sum: per-block sums to the driver —
    O(blocks) ints, the only cross-block exchange — then one in-block
    vectorized cumsum + offset).  Integer arithmetic throughout, so the
    SQL window mirror is bit-exact."""
    from ..stages.textops import add_token_count
    from ..stages.windows import ordered_prefix_sum

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    run = ordered_prefix_sum(
        docs, order_col="doc_id", value_col="n_tokens", out_col="cum_tokens"
    )

    def shard(b: pa.Table) -> pa.Table:
        cum = b.column("cum_tokens")
        n = b.column("n_tokens")
        # exclusive prefix // budget: a doc starts its shard, never splits
        return b.append_column(
            "shard", pc.divide(pc.subtract(cum, n), pa.scalar(4096, pa.int64()))
        )

    return run.map_batches(shard, batch_format="pyarrow")


def q_split_assign(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment over the corpus —
    the reproducible-partitioning primitive every training pipeline needs
    (stages/sampling.assign_split): pure streaming map over the md5
    id-hash, one SQL CASE as the oracle."""
    from ..stages.sampling import assign_split

    return assign_split(
        _docs(sf_dir, ["doc_id", "source"]),
        [("train", 90), ("val", 5), ("test", 5)],
        id_col="doc_id", method="md5",
    )


def q_sample_uniform(sf_dir: str):
    from ..stages.sampling import sample_uniform

    return sample_uniform(
        _docs(sf_dir, ["doc_id", "source"]), 0.1, id_col="doc_id", method="md5"
    )


def q_sample_stratified_exact(sf_dir: str):
    """EXACTLY ceil(n/5) docs per source, selected by md5 id-hash order —
    the exact-count stratified sampler (hash exchange + in-block sort +
    grouped-arange keep)."""
    from ..stages.sampling import sample_stratified_exact

    return sample_stratified_exact(
        _docs(sf_dir, ["doc_id", "source"]), 1, 5,
        group_col="source", id_col="doc_id",
    )


def q_sample_weighted(sf_dir: str):
    """Length-proportional document sample: inclusion probability
    min(1, n_tokens/500) against the deterministic md5 id-hash coin —
    the data-mixing primitive, same oracle machinery as the uniform
    sampler with a per-row cutoff."""
    from ..stages.sampling import sample_weighted
    from ..stages.textops import add_token_count

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    return sample_weighted(
        ds, weight_col="n_tokens", scale_den=500,
        id_col="doc_id", method="md5",
    )


def q_sample_stratified(sf_dir: str):
    from ..stages.sampling import sample_stratified

    return sample_stratified(
        _docs(sf_dir, ["doc_id", "source"]), 0.2,
        group_col="source", id_col="doc_id", method="md5",
    )


def q_ngram_jaccard_1k(sf_dir: str):
    """Exact set-similarity join on a bounded slice (doc_id < 1000; the whole
    corpus at sf<=0.01).  The synthetic corpus has a 31-word vocabulary, so
    EVERY doc pair shares hot shingles and the exact join's candidate set —
    like its O(n²) SQL oracle — is inherently quadratic on it; real webtext
    has high shingle entropy and prefix+positional filtering prunes.  The
    unbounded scale path for near-dup discovery is q_minhash_lsh."""
    from ..stages.dedup import ngram_jaccard_join

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") < 1000,
    )
    return ngram_jaccard_join(docs, threshold=0.8, k=5, num_partitions=4)


def q_editdist_names(sf_dir: str):
    """Edit-distance-bounded fuzzy self-join: all customer-name pairs within
    Levenshtein ≤ 2 on a bounded slice (c_custkey ≤ 300 — zero-padded serial
    names make the slice pair-dense, the worst case for the blocking).
    FastSS ≤2-deletion neighborhoods → hash exchange → per-bucket length
    prefilter + banded-DP verify; EXACT vs the O(n²) levenshtein oracle."""
    from ..stages.dedup import edit_distance_pairs

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filter=pc.field("c_custkey") <= 300,
    )
    return edit_distance_pairs(
        cust, id_col="c_custkey", text_col="c_name",
        max_dist=2, num_partitions=4,
    ).sort(["a", "b"])


def q_exact_dedup(sf_dir: str):
    return exact_dedup_groups(_docs(sf_dir, ["doc_id", "text"]))


def q_domain_cap(sf_dir: str):
    """Per-source document cap (keep the 5 earliest doc_ids per source) —
    the URL/domain-level repetition control of CC-scale corpus passes; one
    hash map/reduce exchange + a grouped-arange selection per partition."""
    from ..stages.dedup import per_key_cap

    ds = _docs(sf_dir, ["doc_id", "source"])
    return per_key_cap(ds, key_cols=["source"], order_col="doc_id", n=5)


def q_sentences(sf_dir: str):
    """Sentence segmentation: explode documents into (doc_id, sent_idx,
    sentence) rows — one RE2 split per batch, offset-math re-windowing, no
    per-row Python; bit-identical to DuckDB regexp_split_to_array."""
    from ..stages.textops import explode_sentences

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(explode_sentences, batch_format="pyarrow")


def q_url_normalize(sf_dir: str):
    """URL canonicalization: deterministic messy URLs are synthesized from
    (doc_id, source) — mixed-case scheme/host, www., default ports, query
    strings, fragments, trailing slashes — then normalized with the
    vectorized RE2 kernel chain.  Both the construction and every
    normalization step are RE2+lower(), so DuckDB mirrors them exactly."""
    from ..stages.textops import normalize_urls

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = b.column("source")
        port = pa.array(np.where(ids % 3 == 0, ":443", ""), pa.string())
        slash = pa.array(np.where(ids % 2 == 0, "/", ""), pa.string())
        q = pa.array(
            np.where(ids % 5 == 0, "?utm_source=feed&id=", ""), pa.string()
        )
        qv = pa.array(np.where(ids % 5 == 0, (ids % 7).astype(str), ""),
                      pa.string())
        frag = pa.array(np.where(ids % 4 == 0, "#frag", ""), pa.string())
        idstr = pa.array(ids.astype(str), pa.string())
        # NB: binary_join_element_wise's LAST argument is the separator
        url = pc.binary_join_element_wise(
            "HTTPS://WWW.", src, ".Example.COM", port, "/Path/", idstr,
            slash, q, qv, frag, "",
        )
        return pa.Table.from_pydict(
            {"doc_id": b.column("doc_id"), "url": url}
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(build, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: normalize_urls(b).select(["doc_id", "url_norm"]),
        batch_format="pyarrow",
    )


_LEV_PROBES = ["smal ring", "blue boltt", "red gizmo"]


def q_fuzzy_match(sf_dir: str):
    """Fuzzy string match (typo-tolerant lookup, the scored side of entity
    linking): min edit distance from every part name to a broadcast probe
    list, via the batch-vectorized Wagner-Fischer kernel (min-plus scan
    breaks the DP's sequential dependency — the only Python loop is over
    the probe's characters).  No shuffle; one streaming map.
    Oracle: DuckDB LEAST(levenshtein(...), ...)."""
    from ..stages.textops import add_min_levenshtein

    return rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda b: add_min_levenshtein(b, _LEV_PROBES, text_col="p_name"),
        batch_format="pyarrow",
    )


def _derived_doc_edges(sf_dir: str) -> rd.Dataset:
    """Directed edge list of the DETERMINISTIC derived doc graph every
    graph-statistic query shares: each doc_id links to (id+1)%N, (id+2)%N
    and (id*7+3)%N — a ring-with-chords topology with guaranteed triangles
    and degree variety, exactly reproducible as one SQL expression.  This
    is the ONE definition of the topology; q_triangles / q_assortativity /
    q_degree_hist and their oracles all hang off it."""
    n_docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate([
            (ids + 1) % n_docs, (ids + 2) % n_docs, (ids * 7 + 3) % n_docs
        ])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(build, batch_format="pyarrow")


def _derived_doc_graph(sf_dir: str) -> rd.Dataset:
    """DISTINCT undirected (a < b) edge set of the derived doc graph:
    per-block canonicalize+distinct, then one C++ hash groupby — the
    exchange is O(distinct edges)."""

    def undirect(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        dst = b.column("dst").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        keep = lo != hi
        t = pa.table({"a": pa.array(lo[keep], pa.int64()),
                      "b": pa.array(hi[keep], pa.int64())})
        return t.group_by(["a", "b"]).aggregate([])

    from ..stages.aggregates import distinct_keys

    return distinct_keys(
        _derived_doc_edges(sf_dir).map_batches(undirect, batch_format="pyarrow"),
        ["a", "b"],
    )


def _node_degrees(e: rd.Dataset) -> rd.Dataset:
    """(node, deg) from a distinct undirected edge Dataset (a, b) — one
    endpoint explode + one map-side-combined count."""
    from ..stages.aggregates import partial_grouped_agg

    def ends(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays(
            [pa.chunked_array([t.column("a"), t.column("b")])],
            names=["node"],
        )

    return partial_grouped_agg(
        e.map_batches(ends, batch_format="pyarrow"), ["node"],
        count_alias="deg",
    )


def q_triangles(sf_dir: str):
    """Distributed triangle count (degree-ordered wedge counting) over the
    shared derived doc graph (`_derived_doc_edges`).  Both the edge
    synthesis and the count are exactly mirrored by DuckDB's 3-way
    self-join (orientation choice cannot change the count)."""
    from ..stages.graph_query import triangle_count

    return triangle_count(_derived_doc_edges(sf_dir))


def q_assortativity(sf_dir: str):
    """Degree assortativity of the derived doc graph: Pearson correlation
    of endpoint degrees over the symmetrized edge list — degrees from one
    combined count, broadcast back onto both endpoints, then the exact
    integer-sum corr engine (grouped_corr, constant key)."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import grouped_corr

    e = _derived_doc_graph(sf_dir).materialize()
    deg = _node_degrees(e)
    j = adaptive_join(e, deg, left_keys=["a"], right_keys=["node"])
    j = j.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("a"), t.column("b"), t.column("deg")],
            names=["a", "b", "da"],
        ),
        batch_format="pyarrow",
    )
    j = adaptive_join(j, deg, left_keys=["b"], right_keys=["node"])

    def sym(t: pa.Table) -> pa.Table:
        da = t.column("da").combine_chunks() \
            if isinstance(t.column("da"), pa.ChunkedArray) else t.column("da")
        db = t.column("deg").combine_chunks() \
            if isinstance(t.column("deg"), pa.ChunkedArray) else t.column("deg")
        x = pa.chunked_array([da, db])
        y = pa.chunked_array([db, da])
        return pa.Table.from_pydict({
            "k": pa.array(["all"] * len(x), pa.string()), "x": x, "y": y,
        })

    r = grouped_corr(
        j.map_batches(sym, batch_format="pyarrow"),
        key_col="k", x_col="x", y_col="y", out_col="assort_r",
    )
    return r.select(["assort_r"])


def q_degree_hist(sf_dir: str):
    """Degree distribution of the derived doc graph (the first graph
    statistic anyone computes): distinct undirected edges → endpoint rows
    → per-node degree (map-side combined) → degree histogram (second tiny
    combine).  Both aggregates are O(distinct keys × blocks) exchanges."""
    from ..stages.aggregates import partial_grouped_agg

    deg = _node_degrees(_derived_doc_graph(sf_dir))
    return partial_grouped_agg(deg, ["deg"], count_alias="n_nodes")


def q_connected_components(sf_dir: str):
    """Standalone connected components (the canonicalize CC machinery as a
    public graph operator): chain edges (u, u+1) within each 5-block of
    doc_ids → components are the 5-blocks, comp = min member.  The DuckDB
    oracle walks the same chains with a recursive CTE."""
    from ..stages.canonicalize import connected_components

    n_docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        u = ids[(ids % 5 != 4) & (ids + 1 < n_docs)]
        # a self-row per doc guarantees every doc gets a label even when its
        # only chain edge is clipped at the corpus end (singleton component)
        return pa.table({
            "key": pa.array(np.concatenate([ids, u]), pa.int64()),
            "mid": pa.array(np.concatenate([ids, u + 1]), pa.int64()),
        })

    pairs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(build, batch_format="pyarrow")
    return connected_components(pairs)


def q_link_predict(sf_dir: str):
    """Common-neighbor link prediction over the shared derived doc graph:
    top-50 NON-adjacent pairs by shared-neighbor count, total-ordered by
    (cn desc, u, w) so the boundary tie class resolves identically in both
    engines.  Wedges are charged to their center through the hash
    exchange; pair counts use the map-side-combined grouped count; the
    adjacency anti-join is the marker-column left join (q_anti_join's
    shape).  The DuckDB oracle is the direct adjacency self-join."""
    from ..stages.graph_query import link_predict_common_neighbors

    return link_predict_common_neighbors(_derived_doc_edges(sf_dir), k=50)


def q_link_predict_ra(sf_dir: str):
    """Resource-allocation link prediction (Zhou et al. 2009) over the
    derived doc graph: Σ 1/deg(center) over shared neighbors, computed as
    the EXACT scaled integer Σ floor(2^40/deg) so the grouped sum is
    order-independent and the SQL mirror hashes bit-identically; top-50
    non-adjacent pairs by (ra desc, u, w)."""
    from ..stages.graph_query import link_predict_common_neighbors

    return link_predict_common_neighbors(
        _derived_doc_edges(sf_dir), k=50, method="ra"
    )


def q_link_predict_jaccard(sf_dir: str):
    """Jaccard-coefficient link prediction over the derived doc graph:
    |N(u) ∩ N(w)| / |N(u) ∪ N(w)| as the EXACT scaled integer
    floor(2^40·cn / (du + dw − cn)) — the division happens once per pair
    AFTER the order-independent grouped count, so both engines compute the
    identical int64; degrees attach via the adaptive join.  Top-50
    non-adjacent pairs by (jaccard desc, u, w)."""
    from ..stages.graph_query import link_predict_common_neighbors

    return link_predict_common_neighbors(
        _derived_doc_edges(sf_dir), k=50, method="jaccard"
    )


def q_passage_dedup(sf_dir: str):
    """Passage-level exact dedup stats (CCNet paragraph dedup over fixed
    20-word windows): per-doc total vs corpus-first-occurrence-kept passage
    counts.  Explode is one vectorized split+binary_join map; first
    occurrence is one grouped MIN with map-side combine; totals are a
    counting map over the docs; the final doc-keyed aggregate×aggregate
    join is adaptive broadcast/shuffle."""
    from ..stages.dedup import passage_dedup_stats

    return passage_dedup_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_substring_dedup(sf_dir: str):
    """Exact-substring self-dedup profile (Lee et al. 2021 ExactSubstr
    shape): per doc, distinct 13-token windows and how many appear verbatim
    in an EARLIER doc.  Hash-sized first exchange; window strings shuffle
    only for the rare multi-doc hashes, settled by an exact string-keyed
    grouped MIN (bit-exact vs the SQL n-gram join, no collision caveat)."""
    from ..stages.dedup import substring_dedup

    return substring_dedup(_docs(sf_dir, ["doc_id", "text"]), n=13)


def q_boilerplate_strip(sf_dir: str):
    """Cross-doc boilerplate removal: every 20-word passage appearing in
    ≥2 distinct docs is stripped; docs rewritten from kept passages (one
    distinct-pair collapse + broadcast frequent set + in-block rewrite —
    document text never shuffles)."""
    from ..stages.dedup import boilerplate_strip

    return boilerplate_strip(
        _docs(sf_dir, ["doc_id", "text"]), min_df=2
    )


def q_intra_doc_repetition(sf_dir: str):
    """Per-doc passage repetition profile (Gopher-style intra-doc signal):
    NO shuffle — a doc is one row, so explode + distinct count run entirely
    inside one streaming map (two C++ hash group_bys per block)."""
    from ..stages.dedup import intra_doc_repetition

    return intra_doc_repetition(_docs(sf_dir, ["doc_id", "text"]))


def q_dedup_keep_best(sf_dir: str):
    """Near-dup dedup with keep-best-quality representative per LSH cluster
    (LSH components ∘ quality scores ∘ grouped_topk(k=1)); singletons keep
    themselves.  Pytest oracle: test_dedup_keep_best_representatives."""
    from ..stages.dedup import dedup_keep_best

    return dedup_keep_best(_docs(sf_dir, ["doc_id", "text"]), num_partitions=4)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs (doc_id >= 25) sharing any char
    13-gram with the probe set (doc_id < 25) — broadcast probe-gram set +
    one streaming rolling-hash map pass, no shuffle."""
    from ..stages.dedup import contamination_hits

    docs = _docs(sf_dir, ["doc_id", "text"])
    probe = docs.filter(expr="doc_id < 25")
    corpus = docs.filter(expr="doc_id >= 25")
    return contamination_hits(corpus, probe, k=13)


def q_knn_top10(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_mod.topk_cosine(ds, KNN_QUERY_VEC, k=10)


def q_knn_sq8(sf_dir: str):
    """SQ8 scalar-quantized ANN: int8-code scan (4×-smaller hot index, one
    dequantized matmul per block, k·oversample candidates) + exact
    full-precision rescore of the candidates only — recovers the EXACT
    top-10 here, so it shares q_knn_top10's SQL oracle."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return knn_mod.sq8_topk(ds, KNN_QUERY_VEC, k=10)


def q_knn_pq(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011): hash-sample-trained
    codebooks (partition-invariant), m-byte codes, broadcast-LUT ADC scan
    + exact rescore — recovers the EXACT top-10 here, so it shares
    q_knn_top10's SQL oracle; pytest covers recall + invariance."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return knn_mod.pq_topk(ds, KNN_QUERY_VEC, k=10, oversample=32,
                           params=knn_mod.pq_fit(ds, m=16))


def q_neardup_pairs(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_mod.allpairs_cosine_threshold(ds, threshold=NEARDUP_THRESHOLD)


def q_decontaminate_semantic(sf_dir: str):
    """Semantic decontamination: corpus embeddings with cosine ≥ 0.45 to
    the broadcast "benchmark" slice (vec_id % 10 = 0) — LINEAR in the
    corpus (one matmul per block against the broadcast bench matrix; see
    stages/knn.cross_neardup), unlike the O(n²) within-corpus pairs."""
    import ray

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def mod10(b: pa.Table) -> pa.Table:
        m = pc.subtract(
            b.column("vec_id"),
            pc.multiply(pc.divide(b.column("vec_id"), 10), 10),
        )
        return b.append_column("_m", m)

    # one read + tag pass feeds BOTH the bench extraction and the scan
    tagged = ds.map_batches(mod10, batch_format="pyarrow").materialize()
    bench_tbls = [t for t in ray.get(tagged.map_batches(
        lambda b: b.filter(pc.equal(b.column("_m"), 0)).drop_columns(["_m"]),
        batch_format="pyarrow",
    ).to_arrow_refs()) if t.num_rows]
    bench = pa.concat_tables(bench_tbls)
    scan = tagged.map_batches(
        lambda b: b.filter(
            pc.not_equal(b.column("_m"), 0)
        ).drop_columns(["_m"]),
        batch_format="pyarrow",
    )
    return knn_mod.cross_neardup(scan, bench, threshold=NEARDUP_THRESHOLD)


# --- rows-only (no SQL-expressible oracle; driver records row counts) ------


def q_lang_id(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_lang_id(b).select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )


def q_rolling_fp(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_rolling_fingerprint(b).select(["doc_id", "roll_fp"]),
        batch_format="pyarrow",
    )


def q_simhash(sf_dir: str):
    from ..stages.dedup import add_simhash

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: add_simhash(b).select(["doc_id", "simhash"]), batch_format="pyarrow"
    )


def q_minhash_lsh(sf_dir: str):
    from ..stages.dedup import minhash_lsh_components

    return minhash_lsh_components(_docs(sf_dir, ["doc_id", "text"]), num_partitions=4)


def q_ivf_knn(sf_dir: str):
    from ..stages.knn import ivf_assign, ivf_search, seeded_centroids

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = seeded_centroids(64, 8)
    assigned = ivf_assign(ds, cents)
    return ivf_search(assigned, cents, KNN_QUERY_VEC, k=10, n_probe=3)


def q_hnsw_knn(sf_dir: str):
    """Graph-ANN (HNSW-class) top-10 over the embeddings table: sharded
    k-NN-graph index (stages/nsw.py) probed with beam search at the
    reference's efs=200 (query_search.py:74-78).  The persisted index is
    cached under /tmp keyed by (sf basename, row count) with a success
    marker, so repeated queries pay only the probe."""
    import os

    import pyarrow.parquet as pq

    from ..stages.knn import seeded_centroids
    from ..stages.nsw import nsw_build_index, nsw_query_index

    path = f"{sf_dir}/embeddings.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    cents = seeded_centroids(64, 8)
    base = f"/tmp/kgray_cache/{os.path.basename(os.path.normpath(sf_dir))}-nsw-{n_rows}"
    marker = f"{base}/_SUCCESS"
    if not os.path.isfile(marker):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        nsw_build_index(ds, cents, base, M=16)
        with open(marker, "w") as f:
            f.write("ok")
    return nsw_query_index(base, cents, KNN_QUERY_VEC, k=10, efs=200)


# --- flagship KG pipeline over the synthetic page table (rows-only) --------

_KG_CACHE: dict[str, Any] = {}


def _kg_result(sf_dir: str):
    """Build (once per process) the KG over deterministic synthetic pages;
    page count scales with the sf documents row count."""
    import os

    from ..sources.pages import write_pages
    from .kg_build import kg_build

    if sf_dir in _KG_CACHE:
        return _KG_CACHE[sf_dir]
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_pages = max(200, n_docs)
    base = f"/tmp/kgray_cache/{os.path.basename(os.path.normpath(sf_dir))}-{n_pages}"
    paths = write_pages(f"{base}/pages", n_pages=n_pages, seed=42, rows_per_file=500)
    res = kg_build(paths, f"{base}/work", batch_size=256, concurrency=2,
                   num_partitions=8, wave_size=64, resume=True,
                   embed=True, embed_dim=64)
    _KG_CACHE[sf_dir] = res
    return res


def q_kg_nodes_by_type(sf_dir: str):
    """Flagship KG build → canonical node histogram (D9)."""
    from ..stages.aggregates import partial_grouped_agg

    res = _kg_result(sf_dir)
    return partial_grouped_agg(res.nodes(), ["type"], count_alias="n_nodes")


def q_kg_edges_by_type(sf_dir: str):
    from ..stages.aggregates import partial_grouped_agg

    res = _kg_result(sf_dir)
    return partial_grouped_agg(
        res.edges(), ["type"],
        maxs={"strength": "max_strength"}, count_alias="n_edges",
    )


def q_kg_search(sf_dir: str):
    """Semantic node search over the flagship output's embedding column
    (K1 over the KG, reference query_search.py:49-111): top-5 nodes by
    cosine against a deterministic probe-text embedding."""
    from ..stages.embedder import hash_embedding

    res = _kg_result(sf_dir)
    q = hash_embedding("Type: person\nName: probe query", dim=64)
    return knn_mod.topk_cosine(
        res.nodes().select_columns(["comp", "embedding"]),
        q, k=5, vec_col="embedding", id_col="comp",
    )


def q_curate_corpus(sf_dir: str):
    """The composed end-to-end curation pass (pipelines/corpus.py): quality
    gate → exact dedup → near-dup keep-best → decontamination → gz-JSONL
    export, over the documents table; returns the per-stage row ledger.
    On THIS synthetic corpus (31-word vocabulary) nearly every document is a
    legitimate near-duplicate, so the keep-best stage collapses hard — the
    honest outcome, same caveat as q_ngram_jaccard_1k.  Rows-only; stage
    semantics are pytest-oracled on a planted corpus (tests/test_corpus.py)."""
    import os

    from .corpus import curate_corpus

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = f"/tmp/kgray_cache/curated-{os.path.basename(os.path.normpath(sf_dir))}"
    res = curate_corpus(docs, out, min_tokens=5, quality_floor=0.02,
                        num_partitions=8)
    led = res["ledger"]
    return pa.table({
        "stage": pa.array(list(led.keys()), pa.string()),
        "rows": pa.array([int(v) for v in led.values()], pa.int64()),
    })


def q_data_audit(sf_dir: str):
    """Data-quality contract checks over the customer table (the gate an
    ingest pipeline runs before spending GPU-hours downstream): null /
    uniqueness / range / set-membership / regex rules evaluated in ONE
    streaming pass of integer partials (+ one distinct exchange for the
    uniqueness rule).  The negative-balance rule has real violations in
    TPC-H data, so the machinery is exercised on a non-zero count."""
    from ..stages.audit import table_audit

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    )
    return table_audit(ds, [
        {"name": "custkey_not_null", "column": "c_custkey", "kind": "not_null"},
        {"name": "custkey_unique", "column": "c_custkey", "kind": "unique"},
        {"name": "acctbal_non_negative", "column": "c_acctbal",
         "kind": "non_negative"},
        {"name": "mktsegment_in_set", "column": "c_mktsegment",
         "kind": "in_set",
         "values": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                    "MACHINERY"]},
        {"name": "name_format", "column": "c_name", "kind": "regex",
         "pattern": "Customer#[0-9]{9}"},
        {"name": "acctbal_range", "column": "c_acctbal", "kind": "range",
         "lo": -1000.0, "hi": 10000.0},
    ])


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich 2016) over the documents
    table: ONE map-side-combined word-frequency exchange (the corpus-scale
    work), then the exact greedy merge loop on the vocabulary-sized
    dictionary — returns the first 30 merges with their counts.  Rows-only;
    the exact-greedy property is pytest-oracled against an independent
    recount-from-scratch reference (tests/test_bpe.py)."""
    from ..stages.bpe import bpe_train

    model = bpe_train(
        _docs(sf_dir, ["doc_id", "text"]), n_merges=30, text_col="text"
    )
    return pa.table({
        "rank": pa.array(range(len(model["merges"])), pa.int64()),
        "pair": pa.array(
            [f"{a}+{b}" for a, b in model["merges"]], pa.string()
        ),
        "n": pa.array(model["merge_counts"], pa.int64()),
    })


def q_quality_classifier(sf_dir: str):
    """Distributed linear quality classifier (the fastText-style lexical
    filter a corpus pipeline trains before any expensive model): labels from
    a deterministic lexical rule (#'join' tokens > #'scan' tokens), hashed
    L2-normalized count features, FULL-BATCH gradient descent (stages/ml.py
    — per-iteration O(dim)-per-block gradient partials, never the corpus);
    returns the 16 largest-|weight| hash buckets.  Rows-only to the driver;
    accuracy/invariance are pytest-oracled (tests/test_ml.py)."""
    from ..stages.ml import dense_hash_features, logreg_fit

    dim = 512

    def add_label(b: pa.Table) -> pa.Table:
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.coalesce(col, ""), " ")
        flat = pc.list_flatten(toks)
        rows = np.repeat(
            np.arange(b.num_rows, dtype=np.int64),
            np.diff(np.asarray(toks.offsets).astype(np.int64)),
        )
        nj = np.zeros(b.num_rows, np.int64)
        ns = np.zeros(b.num_rows, np.int64)
        if len(flat):
            jm = pc.equal(flat, "join").to_numpy(zero_copy_only=False)
            sm = pc.equal(flat, "scan").to_numpy(zero_copy_only=False)
            np.add.at(nj, rows[jm], 1)
            np.add.at(ns, rows[sm], 1)
        return b.append_column(
            "label", pa.array((nj > ns).astype(np.int64), pa.int64())
        )

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_label, batch_format="pyarrow"
    )
    model = logreg_fit(
        docs, label_col="label",
        features_fn=lambda t: dense_hash_features(t, text_col="text", dim=dim),
        dim=dim, iters=400, lr=10.0, l2=1e-5,
    )
    w = np.asarray(model["w"])
    top = np.argsort(-np.abs(w), kind="stable")[:16]
    return pa.table({
        "feature": pa.array(top.astype(np.int64), pa.int64()),
        "weight_r": pa.array(
            np.floor(w[top] * 10000.0) / 10000.0, pa.float64()
        ),
    })


def q_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table → per-cluster
    sizes (iterative algorithm: fused assign+partial-sum passes, O(k×blocks)
    exchange per iteration; deterministic seeded init)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = knn_mod.kmeans_fit(ds, k=8, iters=5)
    return knn_mod.kmeans_assign_counts(ds, cents).sort("cid")


def q_pca(sf_dir: str):
    """Distributed PCA over the embeddings table: one streaming pass emits
    per-block sufficient statistics (n, Σx, XᵀX), a zero-CPU tree combines
    them, driver-side dim×dim eigh.  Returns the 8-component spectrum
    (floor4 so the row set is layout-stable within the allclose contract)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    m = knn_mod.pca_fit(ds, 8)
    return pa.table({
        "component": pa.array(range(8), pa.int32()),
        "explained_variance": pa.array(
            knn_mod.floor4(m["explained_variance"]), pa.float64()),
        "evr": pa.array(
            knn_mod.floor4(m["explained_variance_ratio"]), pa.float64()),
    })


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): semantic dedup of the embeddings table
    — k-means clustering then within-cluster cosine pruning (keep the
    lowest vec_id of every duplicate set).  Pairwise work confined to
    clusters: Σ|c|² compute instead of n²; hash exchange on cid."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return knn_mod.semdedup(ds, k=8, tau=NEARDUP_THRESHOLD).sort("id")


def q_kg_pagerank(sf_dir: str):
    """Entity importance: distributed PageRank over the flagship KG
    (iterative graph algorithm; broadcast node vector + distributed edge
    scatter), top-20 by rank with (rank desc, name, type) tie order."""
    from ..stages.graph_query import pagerank

    res = _kg_result(sf_dir)
    pr = pagerank(res.nodes(), res.edges(), damping=0.85, iters=20)
    return pr.sort(["rank_r", "name", "type"], descending=[True, False, False]).limit(20)


def q_kg_pagerank_weighted(sf_dir: str):
    """Strength-weighted PageRank over the flagship KG: rank flows
    proportionally to each edge's LLM-assigned relationship strength
    (r[i]·strength(i,j)/Σ_out strength) — the GraphRAG relevance ranking
    that respects the extractor's own confidence.  Top-20 by rank with
    (rank desc, name, type) tie order.  Rows-only; the weighted math is
    pytest-oracled against a dense numpy reference in all three regimes
    (tests/test_graph_sharded.py)."""
    from ..stages.graph_query import pagerank

    res = _kg_result(sf_dir)
    pr = pagerank(res.nodes(), res.edges(), damping=0.85, iters=20,
                  weight_col="strength")
    return pr.sort(["rank_r", "name", "type"], descending=[True, False, False]).limit(20)


def q_kg_hits(sf_dir: str):
    """HITS hubs & authorities over the flagship KG (Kleinberg 1999):
    pagerank's broadcast-vector / distributed-edge-scatter topology with
    forward AND reverse pre-sorted index blocks; top-20 by authority with
    (auth desc, name, type) tie order."""
    from ..stages.graph_query import hits

    res = _kg_result(sf_dir)
    ha = hits(res.nodes(), res.edges(), iters=30)
    return ha.sort(
        ["auth_r", "name", "type"], descending=[True, False, False]
    ).limit(20)


def q_kg_ppr(sf_dir: str):
    """Personalized PageRank from a deterministic seed (the
    lexicographically first Person node) — teleport/dangling mass pinned to
    the seed, the GraphRAG neighborhood-relevance ranking; top-20 by rank."""
    from ..stages.graph_query import pagerank

    res = _kg_result(sf_dir)
    seed = (
        res.nodes().select_columns(["name", "type"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("type"), "Person")),
            batch_format="pyarrow",
        )
        .sort("name").limit(1).take_all()[0]["name"]
    )
    pr = pagerank(res.nodes(), res.edges(), damping=0.85, iters=20,
                  personalization=[(seed, "Person")])
    return pr.sort(
        ["rank_r", "name", "type"], descending=[True, False, False]
    ).limit(20)


def _synth_media_cached(sf_dir: str, kind: str, synth_fn) -> "rd.Dataset":
    """Synthesize the deterministic media corpus ONCE per (sf, kind) into a
    /tmp parquet cache (the _KG_CACHE pattern, persistent across processes
    via a _SUCCESS marker) — re-synthesizing BMP/WAV bytes every bench run
    was q_audio_neardup's dominant avoidable cost.  The decode+fingerprint
    pipeline itself is never cached: that is the measured work."""
    import os

    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    base = (
        f"/tmp/kgray_cache/media-{kind}-"
        f"{os.path.basename(os.path.normpath(sf_dir))}-{n}"
    )
    marker = f"{base}/_SUCCESS"
    data = f"{base}/data"
    if not os.path.isfile(marker):
        # write to a pid-private dir, then one atomic rename: a concurrent
        # process either wins the rename or discards its copy — the cache
        # can never hold two writers' mixed (doubled) files
        tmp = f"{base}/data.tmp.{os.getpid()}"
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(
            synth_fn, batch_format="pyarrow", batch_size=256
        ).write_parquet(tmp)
        try:
            os.rename(tmp, data)
        except OSError:  # another process won
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        with open(marker, "w") as f:
            f.write("ok")
    return rd.read_parquet(data)


def q_phash_neardup(sf_dir: str):
    """Image near-dup detection, the multimodal dedup pipeline: documents
    doc_ids → deterministic BMP corpus with planted near-dups (every id ≡ 1
    mod 7 is a 1-pixel nudge of its predecessor) → real BMP decode +
    64-bit pHash on an actor pool → banded pairs, EXACT at hamming ≤ 3 by
    pigeonhole.  Pytest oracle: brute-force all-pairs hamming."""
    from ..stages.multimodal import (
        compute_phashes,
        docs_to_bmp_media,
        phash_neardup_pairs,
    )

    media = _synth_media_cached(sf_dir, "bmp", docs_to_bmp_media)
    return phash_neardup_pairs(
        compute_phashes(media, backend="raw", concurrency=4), max_hamming=3
    )


def q_audio_neardup(sf_dir: str):
    """Audio near-dup detection, the audio twin of q_phash_neardup:
    doc_ids → deterministic WAV tone corpus with planted −66 dB-noise
    near-dups → real PCM16 decode + 64-bit band-energy fingerprint
    (band-presence bitmap, actor pool) → banded pairs, exact at
    hamming ≤ 2.  Pytest oracle: brute-force all-pairs hamming."""
    from ..stages.multimodal import (
        compute_audio_fingerprints,
        docs_to_wav_media,
        phash_neardup_pairs,
    )

    media = _synth_media_cached(sf_dir, "wav", docs_to_wav_media)
    return phash_neardup_pairs(
        compute_audio_fingerprints(media, backend="raw", concurrency=4),
        max_hamming=2, hash_col="afp",
    )


def q_kg_centrality(sf_dir: str):
    """Harmonic centrality of the 5 lexicographically-first Person nodes
    over the flagship KG: one broadcast-frontier BFS per seed, scores as
    exact scaled integers Σ floor(2^40/d) — order-independent."""
    from ..stages.graph_query import harmonic_centrality

    res = _kg_result(sf_dir)
    seeds = [
        r["name"]
        for r in res.nodes().select_columns(["name", "type"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("type"), "Person")),
            batch_format="pyarrow",
        )
        .sort("name").limit(5).take_all()
    ]
    edges = res.edges().select_columns(["src", "dst"])
    return rd.from_arrow(harmonic_centrality(edges, seeds, max_hops=16))


def q_kg_betweenness(sf_dir: str):
    """Betweenness centrality over the flagship KG — Brandes & Pich pivot
    estimator (256 deterministic grid pivots, one Ray task per 64-pivot
    chunk over the broadcast CSR, fixed-tree float combine): the top-20
    broker entities by (betweenness desc, name)."""
    from ..stages.graph_query import betweenness_centrality

    res = _kg_result(sf_dir)
    t = betweenness_centrality(
        res.edges().select_columns(["src", "dst"]), k_pivots=256
    )
    return rd.from_arrow(t).sort(
        ["betweenness", "name"], descending=[True, False]
    ).limit(20)


def q_kg_khop(sf_dir: str):
    """Multi-hop neighborhood retrieval over the flagship KG: 2-hop BFS
    from a deterministic seed (the lexicographically first person node),
    broadcast-frontier semi-joins — edge rows never shuffle."""
    from ..stages.graph_query import khop

    res = _kg_result(sf_dir)
    seed = (
        res.nodes().select_columns(["name", "type"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("type"), "Person")),
            batch_format="pyarrow",
        )
        .sort("name").limit(1).take_all()[0]["name"]
    )
    return khop(res.edges(), [seed], k=2)


def q_kg_ego(sf_dir: str):
    """2-hop ego SUBGRAPH around the deterministic seed (the GraphRAG
    context-retrieval shape): the induced edge rows, via one khop BFS +
    one streaming is_in filter — edges never shuffle."""
    from ..stages.graph_query import ego_subgraph

    res = _kg_result(sf_dir)
    seed = (
        res.nodes().select_columns(["name", "type"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("type"), "Person")),
            batch_format="pyarrow",
        )
        .sort("name").limit(1).take_all()[0]["name"]
    )
    return (
        ego_subgraph(res.edges(), [seed], k=2)
        .select_columns(["src", "dst", "type"])
        .sort(["src", "dst", "type"])
    )


def q_kg_communities(sf_dir: str):
    """Community detection over the flagship KG edge set: 4 rounds of
    deterministic synchronous label propagation (min-label tiebreak), then
    community sizes — top 20 by (size desc, community)."""
    from ..stages.aggregates import partial_grouped_agg
    from ..stages.graph_query import label_propagation

    labels = label_propagation(_kg_result(sf_dir).edges(), rounds=4)
    sizes = partial_grouped_agg(labels, ["community"], count_alias="n_nodes")
    return sizes.sort(["n_nodes", "community"],
                      descending=[True, False]).limit(20)


def q_kg_kcore(sf_dir: str):
    """k-core decomposition of the flagship KG (H-index fixpoint = exact
    core numbers; peeling-oracle tested), aggregated to the core-size
    distribution."""
    from ..stages.aggregates import partial_grouped_agg
    from ..stages.graph_query import core_numbers

    cores = core_numbers(_kg_result(sf_dir).edges())
    return partial_grouped_agg(cores, ["core"], count_alias="n_nodes").sort("core")


def q_kg_walks(sf_dir: str):
    """Deterministic random-walk corpus over the flagship KG (the
    DeepWalk/node2vec training-data front-end): one length-4 walk per
    node, splitmix64-hash "randomness" — a pure function of (edge set,
    seed)."""
    from ..stages.graph_query import random_walks

    return random_walks(_kg_result(sf_dir).edges(), length=4, seed=0)


def q_kg_linking(sf_dir: str):
    """Entity-linking candidate stage (north-star fuzzy capability): derive
    deterministic mention pairs from the documents table — an "org <hex>"
    surface plus a truncated variant per doc — and return the scored ANN
    candidate pairs (MinHash-LSH candidates + exact char-n-gram cosine
    verify) at the default threshold.  Each (2·doc_id, 2·doc_id+1) pair must
    link; unrelated hex stems must not (pytest oracle:
    test_linking.py::test_q_kg_linking_pairs_complete)."""
    import numpy as np

    from ..functions.hashing import hash_string_array
    from ..stages.linking import LinkingConfig, scored_candidate_pairs

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        filter=pc.field("doc_id") < 5000,
    )

    def mk_mentions(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = hash_string_array(pc.cast(b.column("doc_id"), pa.string()))
        stems = [f"{int(x):016x}" for x in h]
        names, mids = [], []
        for i, s in zip(ids, stems):
            names.append(f"org {s}")
            mids.append(int(i) * 2)
            names.append(f"org {s[:-2]}")   # truncated variant — must link
            mids.append(int(i) * 2 + 1)
        n = len(names)
        return pa.table({
            "mid": pa.array(mids, pa.int64()),
            "entity_name": pa.array(names, pa.string()),
            "entity_type": pa.array(["Organization"] * n, pa.string()),
            "attributes_json": pa.array(["{}"] * n, pa.string()),
        })

    mentions = docs.map_batches(mk_mentions, batch_format="pyarrow")
    return scored_candidate_pairs(mentions, LinkingConfig()).sort(
        ["mid_a", "mid_b"]
    )


def q_neardup_lsh(sf_dir: str):
    """Subquadratic near-dup pairs: sign-random-projection LSH candidates +
    exact cosine verify (the 100 TB path; allpairs is the exact oracle)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_mod.neardup_pairs_lsh(ds, threshold=NEARDUP_THRESHOLD, num_partitions=4)


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB; views documents/events/customer/orders/... preregistered)
# ---------------------------------------------------------------------------

import os as _os

# committed golden artifacts for the flagship KG outputs (see the
# q_kg_nodes_by_type / q_kg_edges_by_type entries below)
_GOLDEN_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "golden",
)

ORACLE_SQL: dict[str, str] = {
    "q_filter_project": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE lang = 'en' AND n_chars > 300
    """,
    "q_point_lookup": """
        SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42
    """,
    "q_groupby_count": """
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    """,
    "q_doc_stats_by_source": """
        SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY source
    """,
    "q_topk_events": """
        SELECT event_id, event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents
        FROM events ORDER BY value DESC, event_id ASC LIMIT 10
    """,
    "q_sorted_limit": """
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5
    """,
    "q_join_agg": """
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q_semi_join": """
        SELECT c_nationkey AS nationkey, count(*) AS n_customers
        FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        GROUP BY c_nationkey
    """,
    "q_left_join": """
        SELECT c.c_custkey AS c_custkey,
               coalesce(o.n_orders, 0) AS n_orders,
               coalesce(o.spent_cents, 0) AS spent_cents
        FROM customer c LEFT JOIN (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS spent_cents
          FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    """,
    "q_rollup_revenue": """
        WITH base AS (
          SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT coalesce(n_name, 'ALL') AS n_name,
               coalesce(yr, -1) AS yr,
               CAST(sum(cents) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM base GROUP BY ROLLUP(n_name, yr)
    """,
    "q_rrf_fusion": """
        WITH a AS (
          SELECT doc_id, row_number() OVER (
            ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS r
          FROM documents QUALIFY r <= 100
        ),
        b AS (
          SELECT doc_id, row_number() OVER (ORDER BY md5(text), doc_id) AS r
          FROM documents QUALIFY r <= 100
        ),
        u AS (
          SELECT doc_id, 1.0 / (60 + r) AS s FROM a
          UNION ALL
          SELECT doc_id, 1.0 / (60 + r) FROM b
        ),
        f AS (SELECT doc_id, sum(s) AS score FROM u GROUP BY doc_id)
        SELECT doc_id, floor(score * 1e8) / 1e8 AS rrf
        FROM f ORDER BY score DESC, doc_id LIMIT 20
    """,
    "q_cube_events": """
        WITH base AS (
          SELECT event_type,
                 CAST(user_id & 7 AS BIGINT) AS uid_bucket,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events
        )
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(uid_bucket, -1) AS uid_bucket,
               CAST(sum(cents) AS BIGINT) AS value_cents,
               CAST(count(*) AS BIGINT) AS n_events
        FROM base GROUP BY CUBE(event_type, uid_bucket)
    """,
    "q_bloom_semi_join": """
        SELECT l_returnflag, count(*) AS n_items
        FROM lineitem WHERE l_orderkey IN
            (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
    """,
    "q_anti_join": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        GROUP BY o_orderpriority
    """,
    "q_lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_events_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1, 2
    """,
    "q_sessionize": """
        WITH e AS (
          SELECT user_id,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                           OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM e GROUP BY user_id
    """,
    "q_asof_join": """
        SELECT e.event_id, e.user_id, m.o_orderkey, m.o_price_cents
        FROM events e
        LEFT JOIN (
          SELECT e2.event_id AS eid, o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_price_cents,
                 row_number() OVER (
                   PARTITION BY e2.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                 ) AS rn
          FROM events e2
          JOIN orders o ON e2.user_id = o.o_custkey AND o.o_orderdate <= e2.ts
        ) m ON m.eid = e.event_id AND m.rn = 1
    """,
    "q_asof_forward": """
        SELECT e.event_id, e.user_id, m.o_orderkey, m.o_price_cents
        FROM events e
        LEFT JOIN (
          SELECT e2.event_id AS eid, o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_price_cents,
                 row_number() OVER (
                   PARTITION BY e2.event_id
                   ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
                 ) AS rn
          FROM events e2
          JOIN orders o ON e2.user_id = o.o_custkey AND o.o_orderdate >= e2.ts
        ) m ON m.eid = e.event_id AND m.rn = 1
    """,
    "q_range_join": """
        SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a
        JOIN events b ON a.user_id = b.user_id AND b.ts > a.ts
                     AND b.ts <= a.ts + INTERVAL 60 MINUTE
    """,
    "q_rolling_sum": """
        SELECT event_id,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS roll_sum
        FROM events
    """,
    "q_top3_orders": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                            o_orderkey ASC
                 ) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    "q_value_median": """
        SELECT event_type,
               quantile_disc(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.5)
                 AS median_cents
        FROM events GROUP BY event_type
    """,
    "q_hopping_window": """
        WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
        x AS (
          SELECT event_type,
                 (t // 900000000 - j) * 900000000 AS window_us
          FROM e, UNNEST(range(0, 4)) AS u(j)
        )
        SELECT window_us, event_type, count(*) AS n
        FROM x GROUP BY 1, 2
    """,
    "q_token_commonness": """
        WITH tok AS (
          SELECT doc_id,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        g AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term)
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS commonness,
               count(*) AS n_tokens
        FROM tok JOIN g USING (term) GROUP BY doc_id
    """,
    "q_unpivot": """
        WITH s AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS quantity_cents,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS extendedprice_cents,
                 CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS discount_cents,
                 CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tax_cents
          FROM lineitem WHERE l_orderkey < 2000
        )
        SELECT l_orderkey, l_linenumber, 'quantity_cents' AS measure,
               quantity_cents AS cents FROM s
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice_cents', extendedprice_cents FROM s
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount_cents', discount_cents FROM s
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax_cents', tax_cents FROM s
    """,
    "q_cumulative_distinct": """
        WITH f AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id
                      ) = 1 THEN 1 ELSE 0 END AS first_flag
          FROM events
        )
        SELECT event_id,
               CAST(sum(first_flag) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS n_seen
        FROM f
    """,
    "q_transition_matrix": """
        WITH s AS (
          SELECT event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        )
        SELECT event_type AS prev, nxt, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    """,
    "q_table_diff": """
        WITH base AS (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS p
          FROM orders
        ),
        old AS (SELECT * FROM base WHERE o_orderkey % 5 <> 0),
        new AS (
          SELECT o_orderkey,
                 p + CASE WHEN o_orderkey % 2 = 0 THEN 100 ELSE 0 END AS p
          FROM base WHERE o_orderkey % 3 <> 0
        )
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.p IS DISTINCT FROM n.p THEN 'changed'
                    ELSE 'unchanged' END AS status,
               o.p AS price_cents_old, n.p AS price_cents_new
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
    "q_mad": """
        WITH e AS (
          SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        m AS (
          SELECT user_id, quantile_disc(v, 0.5) AS med FROM e GROUP BY user_id
        )
        SELECT e.user_id, quantile_disc(abs(e.v - m.med), 0.5) AS mad
        FROM e JOIN m USING (user_id) GROUP BY e.user_id
    """,
    "q_weighted_median": """
        WITH t AS (
          SELECT l_returnflag AS k,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
                 CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS w
          FROM lineitem
        ),
        g AS (SELECT k, v, sum(w) AS w FROM t GROUP BY k, v),
        c AS (
          SELECT k, v,
                 sum(w) OVER (PARTITION BY k ORDER BY v) AS cw,
                 sum(w) OVER (PARTITION BY k) AS tw
          FROM g
        )
        SELECT k AS l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_cents
        FROM c WHERE 2 * cw >= tw GROUP BY k
    """,
    "q_outliers_iqr": """
        WITH e AS (
          SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        q AS (
          SELECT user_id, quantile_disc(v, 0.25) AS q1,
                 quantile_disc(v, 0.75) AS q3
          FROM e GROUP BY user_id
        ),
        o AS (
          SELECT e.user_id, count(*) AS c
          FROM e JOIN q USING (user_id)
          WHERE 2*e.v < 2*q.q1 - 3*(q.q3 - q.q1)
             OR 2*e.v > 2*q.q3 + 3*(q.q3 - q.q1)
          GROUP BY e.user_id
        )
        SELECT q.user_id, CAST(coalesce(o.c, 0) AS BIGINT) AS n_outliers
        FROM q LEFT JOIN o USING (user_id)
    """,
    "q_value_p90": """
        SELECT event_type,
               quantile_disc(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.9)
                 AS p90_cents
        FROM events GROUP BY event_type
    """,
    "q_value_p90_hist": """
        SELECT event_type,
               quantile_disc(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.9)
                 AS p90_cents
        FROM events GROUP BY event_type
    """,
    "q_set_ops": """
        SELECT user_id FROM (
          (SELECT DISTINCT user_id FROM events
             WHERE event_type = 'purchase' AND value > 50
           INTERSECT
           SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
          EXCEPT
          SELECT DISTINCT user_id FROM events
            WHERE event_type = 'error' AND value > 80
        )
    """,
    "q_corr_qty_price": """
        WITH c AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
          FROM lineitem
        ),
        s AS (
          SELECT l_returnflag,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x * y AS HUGEINT)) AS sxy,
                 sum(CAST(x * x AS HUGEINT)) AS sxx,
                 sum(CAST(y * y AS HUGEINT)) AS syy
          FROM c GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
        FROM s
    """,
    "q_ols_per_flag": """
        WITH c AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
          FROM lineitem
        ),
        s AS (
          SELECT l_returnflag,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x * y AS HUGEINT)) AS sxy,
                 sum(CAST(x * x AS HUGEINT)) AS sxx
          FROM c GROUP BY l_returnflag
        ),
        d AS (
          SELECT l_returnflag, n, sx, sy,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS den
          FROM s
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               CASE WHEN n < 2 OR den = 0 THEN NULL
                    ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
               CASE WHEN n < 2 OR den = 0 THEN NULL
                    ELSE CAST(sy * den - num * sx AS DOUBLE)
                         / CAST(n * den AS DOUBLE) END AS intercept
        FROM d
    """,
    "q_containment": """
        WITH sh AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS g
          FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
          WHERE doc_id < 500
        ),
        sizes AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               floor(i / CAST(sa.s AS DOUBLE) * 10000.0) / 10000.0
                 AS containment_r
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        WHERE i / CAST(sa.s AS DOUBLE) >= 0.55
    """,
    "q_resample_locf": """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS ets_us, event_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
          FROM events WHERE user_id < 100
        ),
        b AS (
          SELECT (min(ets_us) // 21600000000) * 21600000000 AS lo,
                 max(ets_us) AS hi
          FROM ev
        ),
        marks AS (
          SELECT unnest(generate_series((SELECT lo FROM b),
                                        (SELECT hi FROM b),
                                        21600000000)) AS ts_us
        ),
        users AS (SELECT DISTINCT user_id FROM ev),
        grid AS (SELECT u.user_id, m.ts_us FROM users u CROSS JOIN marks m)
        SELECT g.user_id, g.ts_us, m.vc AS locf_cents
        FROM grid g
        LEFT JOIN (
          SELECT g2.user_id AS uid, g2.ts_us AS gts, e.vc,
                 row_number() OVER (
                   PARTITION BY g2.user_id, g2.ts_us
                   ORDER BY e.ets_us DESC, e.event_id DESC) AS rn
          FROM grid g2 JOIN ev e
            ON e.user_id = g2.user_id AND e.ets_us <= g2.ts_us
        ) m ON m.uid = g.user_id AND m.gts = g.ts_us AND m.rn = 1
    """,
    "q_pack_sequences": """
        WITH d AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
        ),
        c AS (
          SELECT doc_id, n,
                 CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS cum
          FROM d
        ),
        x AS (
          SELECT doc_id, n, cum, cum - n AS off FROM c WHERE n > 0
        ),
        e AS (
          SELECT doc_id, off, cum,
                 unnest(generate_series(off // 512, (cum - 1) // 512)) AS seq
          FROM x
        )
        SELECT seq,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(cum, (seq + 1) * 512)
                        - greatest(off, seq * 512)) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM e GROUP BY seq
    """,
    "q_interval_coverage": """
        WITH iv AS (
          SELECT user_id,
                 epoch_us(ts) AS s,
                 epoch_us(ts)
                   + CAST(floor(value * 100.0 + 0.5) AS BIGINT) * 1000000 AS e
          FROM events
        ),
        m AS (
          SELECT user_id, s, e,
                 max(e) OVER (PARTITION BY user_id ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS pm
          FROM iv
        ),
        g AS (
          SELECT user_id, s, e,
                 CAST(sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS island
          FROM m
        ),
        isl AS (
          SELECT user_id, island, min(s) AS island_s, max(e) AS island_e
          FROM g GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(sum(island_e - island_s) AS BIGINT) AS covered,
               CAST(min(island_s) AS BIGINT) AS first_start,
               CAST(max(island_e) AS BIGINT) AS last_end
        FROM isl GROUP BY user_id
    """,
    "q_clustering_coeff": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY node
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        tv AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        ),
        tc AS (
          SELECT node, CAST(count(*) AS BIGINT) AS tri FROM tv GROUP BY node
        )
        SELECT d.node, d.deg, coalesce(tc.tri, 0) AS tri,
               CAST(2 * coalesce(tc.tri, 0) AS DOUBLE)
                 / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS cc
        FROM deg d LEFT JOIN tc ON d.node = tc.node
        WHERE d.deg >= 2
        ORDER BY cc DESC, d.node LIMIT 20
    """,
    "q_pmi_bigrams": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term,
                 CAST(generate_subscripts(
                   string_split(coalesce(text, ''), ' '), 1) AS BIGINT)
                   AS pos
          FROM documents
        ),
        uni AS (
          SELECT term, CAST(count(*) AS HUGEINT) AS c FROM tok GROUP BY term
        ),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS n_tok FROM tok),
        bg AS (
          SELECT a.term AS w1, b.term AS w2, CAST(count(*) AS HUGEINT) AS n
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          GROUP BY 1, 2
        )
        SELECT w1 || ' ' || w2 AS bigram,
               CAST(n AS BIGINT) AS n,
               CAST(n * n_tok AS DOUBLE)
                 / CAST(u1.c * u2.c AS DOUBLE) AS pmi_ratio
        FROM bg
        CROSS JOIN tot
        JOIN uni u1 ON bg.w1 = u1.term
        JOIN uni u2 ON bg.w2 = u2.term
        WHERE n >= 5
        ORDER BY pmi_ratio DESC, bigram
        LIMIT 20
    """,
    "q_cooccur_parts": """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n DESC, part_a, part_b LIMIT 20
    """,
    "q_sssp": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
        ),
        seed AS (SELECT min(l_partkey) AS p FROM lineitem),
        bfs(part, dist) AS (
          SELECT p, 0 FROM seed
          UNION
          SELECT e.d, bfs.dist + 1
          FROM bfs JOIN e ON e.s = bfs.part
          WHERE bfs.dist < 3
        )
        SELECT part, CAST(min(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY part
    """,
    "q_harmonic_parts": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
        ),
        seeds AS (SELECT DISTINCT s AS p FROM e ORDER BY s LIMIT 5),
        bfs(seed, part, dist) AS (
          SELECT p, p, 0 FROM seeds
          UNION
          SELECT bfs.seed, e.d, bfs.dist + 1
          FROM bfs JOIN e ON e.s = bfs.part
          WHERE bfs.dist < 4
        ),
        md AS (SELECT seed, part, min(dist) AS d FROM bfs GROUP BY 1, 2)
        SELECT seed AS part,
               CAST(coalesce(
                 SUM(1099511627776 // d) FILTER (WHERE d > 0), 0
               ) AS BIGINT) AS harmonic_s,
               CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS n_reachable
        FROM md GROUP BY seed
    """,
    "q_skyline": """
        SELECT p_partkey, p_retailprice, p_size
        FROM part r
        WHERE NOT EXISTS (
          SELECT 1 FROM part o
          WHERE o.p_retailprice <= r.p_retailprice
            AND o.p_size >= r.p_size
            AND (o.p_retailprice < r.p_retailprice OR o.p_size > r.p_size)
        )
    """,
    "q_quota_sample": """
        WITH t AS (
          SELECT quantile_disc(n_chars, 0.25) AS q1,
                 quantile_disc(n_chars, 0.50) AS q2,
                 quantile_disc(n_chars, 0.75) AS q3
          FROM documents
        )
        SELECT d.doc_id, d.source, d.n_chars,
               CAST(CAST(d.n_chars > t.q1 AS INT)
                  + CAST(d.n_chars > t.q2 AS INT)
                  + CAST(d.n_chars > t.q3 AS INT) AS BIGINT) AS bucket
        FROM documents d, t
        WHERE CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 16))
                   AS UBIGINT) % 1000000
              < CASE CAST(d.n_chars > t.q1 AS INT)
                   + CAST(d.n_chars > t.q2 AS INT)
                   + CAST(d.n_chars > t.q3 AS INT)
                  WHEN 0 THEN 50000 WHEN 1 THEN 200000
                  WHEN 2 THEN 500000 ELSE 1000000 END
    """,
    "q_keyness_chi2": """
        WITH toks AS (
          SELECT source,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        st AS (SELECT source, term, count(*) AS a FROM toks GROUP BY 1, 2),
        s AS (SELECT source, count(*) AS cs FROM toks GROUP BY 1),
        t AS (SELECT term, count(*) AS ct FROM toks GROUP BY 1),
        n AS (SELECT count(*) AS n FROM toks)
        SELECT st.source, st.term,
               floor(
                 ((CAST(n.n AS DOUBLE)
                   * CAST(st.a * (n.n - s.cs - t.ct + st.a)
                          - (s.cs - st.a) * (t.ct - st.a) AS DOUBLE)
                   * CAST(st.a * (n.n - s.cs - t.ct + st.a)
                          - (s.cs - st.a) * (t.ct - st.a) AS DOUBLE))
                  / (CAST(s.cs AS DOUBLE) * CAST(n.n - s.cs AS DOUBLE)
                     * CAST(t.ct AS DOUBLE) * CAST(n.n - t.ct AS DOUBLE)))
                 * 10000.0) / 10000.0 AS chi2_r
        FROM st JOIN s USING (source) JOIN t USING (term) CROSS JOIN n
    """,
    # Gini: ranks from the same ascending sort (tie order immaterial); both
    # sides keep the numerator/denominator as exact ints and divide ONCE in
    # double, then floor4 — bit-identical floats
    "q_gini": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
          WHERE value IS NOT NULL
            AND CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= 0
        ),
        r AS (
          SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY v) AS i
          FROM e
        ),
        a AS (
          SELECT event_type, count(*) AS n, sum(v) AS s, sum(i * v) AS six
          FROM r GROUP BY event_type
        )
        SELECT event_type,
               floor(CAST(2 * six - (n + 1) * s AS DOUBLE)
                     / CAST(n * s AS DOUBLE) * 10000.0) / 10000.0 AS gini_r
        FROM a WHERE s > 0 ORDER BY event_type
    """,
    # each rule is one filtered count; regexp_matches is RE2 on both sides
    "q_data_audit": """
        WITH c AS (SELECT * FROM customer),
        n AS (SELECT count(*) AS rows_ FROM c)
        SELECT * FROM (
          SELECT 'acctbal_non_negative' AS "check",
                 (SELECT count(*) FROM c WHERE c_acctbal < 0) AS violations,
                 rows_ AS rows FROM n
          UNION ALL
          SELECT 'acctbal_range',
                 (SELECT count(*) FROM c
                  WHERE c_acctbal < -1000.0 OR c_acctbal > 10000.0),
                 rows_ FROM n
          UNION ALL
          SELECT 'custkey_not_null',
                 (SELECT count(*) FROM c WHERE c_custkey IS NULL),
                 rows_ FROM n
          UNION ALL
          SELECT 'custkey_unique',
                 (SELECT count(c_custkey) - count(DISTINCT c_custkey) FROM c),
                 rows_ FROM n
          UNION ALL
          SELECT 'mktsegment_in_set',
                 (SELECT count(*) FROM c
                  WHERE c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
                    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
                     'MACHINERY')),
                 rows_ FROM n
          UNION ALL
          SELECT 'name_format',
                 (SELECT count(*) FROM c
                  WHERE c_name IS NOT NULL
                    AND NOT regexp_matches(c_name,
                          '^(?:Customer#[0-9]{9})$')),
                 rows_ FROM n
        ) ORDER BY "check"
    """,
    "q_twap": """
        WITH w AS (
          SELECT user_id,
                 epoch_us(ts) // 1000000 AS ts_s,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
                 lead(epoch_us(ts) // 1000000) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events
        )
        SELECT user_id,
               CAST(SUM(v * (nxt - ts_s)) AS DOUBLE)
               / CAST(NULLIF(max(ts_s) - min(ts_s), 0) AS DOUBLE) AS twap
        FROM w GROUP BY user_id
    """,
    "q_source_overlap": """
        WITH tok AS (
          SELECT source, string_split(coalesce(text, ''), ' ') AS a
          FROM documents
        ),
        wins AS (
          SELECT source, array_to_string(a[i:i+4], ' ') AS w
          FROM tok, unnest(range(1, len(a) - 3)) AS t(i)
        ),
        dw AS (SELECT DISTINCT source, w FROM wins),
        sz AS (SELECT source, count(*) AS n FROM dw GROUP BY source),
        i AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
          FROM dw a JOIN dw b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT i.src_a, i.src_b,
               CAST(i.n_inter AS BIGINT) AS n_inter,
               CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
               CAST(i.n_inter AS DOUBLE)
               / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
        FROM i JOIN sz sa ON sa.source = i.src_a
               JOIN sz sb ON sb.source = i.src_b
    """,
    "q_lexical_diversity": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term
          FROM documents
        ),
        c AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        a AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(c * c) AS BIGINT) AS simpson_num
          FROM c GROUP BY 1
        )
        SELECT doc_id, n_tokens, n_types, simpson_num,
               floor(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     * 10000.0) / 10000.0 AS ttr_r,
               floor((1.0 - CAST(simpson_num AS DOUBLE)
                      / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)))
                     * 10000.0) / 10000.0 AS simpson_r
        FROM a
    """,
    "q_lm_perplexity": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term,
                 CAST(generate_subscripts(
                   string_split(coalesce(text, ''), ' '), 1) AS BIGINT) AS pos
          FROM documents
        ),
        bg AS (
          SELECT a.doc_id, a.term AS a, b.term AS b
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                FROM bg GROUP BY 1, 2),
        ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c_a FROM bg GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tok),
        terms AS (
          SELECT g.doc_id,
                 (cab.c_ab + 1) * 1048576 // (ca.c_a + v.v) AS t
          FROM bg g JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(t) AS BIGINT) AS lm_score
          FROM terms GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams, lm_score,
               floor(CAST(lm_score AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                     * 10000.0) / 10000.0 AS lm_avg_r
        FROM agg
    """,
    "q_mad_by_type": """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        m AS (SELECT event_type, quantile_disc(v, 0.5) AS med
              FROM c GROUP BY 1)
        SELECT c.event_type,
               CAST(quantile_disc(abs(c.v - m.med), 0.5) AS BIGINT)
                 AS mad_cents
        FROM c JOIN m USING (event_type)
        GROUP BY c.event_type
    """,
    "q_mutual_nn": """
        WITH pairs AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])) AS c
          FROM embeddings a JOIN embeddings b
            ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        ),
        ba AS (SELECT ia, ib, c, row_number()
                 OVER (PARTITION BY ia ORDER BY c DESC, ib) AS r FROM pairs),
        bb AS (SELECT ia, ib, row_number()
                 OVER (PARTITION BY ib ORDER BY c DESC, ia) AS r FROM pairs)
        SELECT ba.ia AS id_a, ba.ib AS id_b,
               floor(ba.c * 10000.0) / 10000.0 AS cos_r
        FROM ba JOIN bb ON ba.ia = bb.ia AND ba.ib = bb.ib
        WHERE ba.r = 1 AND bb.r = 1
    """,
    "q_first_last": """
        WITH w AS (
          SELECT user_id, event_type, ts,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ) AS rn_d,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM events
        )
        SELECT user_id,
               max(CASE WHEN rn_a = 1 THEN ts END)         AS first_ts,
               max(CASE WHEN rn_a = 1 THEN event_type END) AS first_event_type,
               max(CASE WHEN rn_d = 1 THEN ts END)         AS last_ts,
               max(CASE WHEN rn_d = 1 THEN event_type END) AS last_event_type,
               CAST(max(n) AS BIGINT) AS n_events
        FROM w GROUP BY user_id
    """,
    "q_basket_lift": """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        nord AS (
          SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS n FROM d
        ),
        ic AS (
          SELECT l_partkey, CAST(count(*) AS HUGEINT) AS c FROM d GROUP BY 1
        ),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(count(*) AS HUGEINT) AS nab
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT part_a, part_b, CAST(nab AS BIGINT) AS n,
               CAST(nab * nord.n AS DOUBLE)
                 / CAST(ca.c * cb.c AS DOUBLE) AS lift
        FROM pairs
        CROSS JOIN nord
        JOIN ic ca ON ca.l_partkey = part_a
        JOIN ic cb ON cb.l_partkey = part_b
        ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    "q_json_extract": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
    "q_user_journey": """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
        FROM events GROUP BY user_id
    """,
    "q_mode_per_user": """
        SELECT user_id, event_type AS mode_type, count(*) AS n_events
        FROM events
        GROUP BY user_id, event_type
        QUALIFY row_number() OVER (
          PARTITION BY user_id ORDER BY count(*) DESC, event_type
        ) = 1
    """,
    "q_profile_events": """
        WITH c AS (
          SELECT event_id, user_id,
                 CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents
          FROM events
        )
        SELECT 'event_id' AS column, count(*) AS n,
               count(*) - count(event_id) AS n_null,
               min(event_id) AS min_v, max(event_id) AS max_v FROM c
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               min(user_id), max(user_id) FROM c
        UNION ALL
        SELECT 'ts_us', count(*), count(*) - count(ts_us),
               min(ts_us), max(ts_us) FROM c
        UNION ALL
        SELECT 'value_cents', count(*), count(*) - count(value_cents),
               min(value_cents), max(value_cents) FROM c
    """,
    "q_value_median_cont": """
        SELECT event_type,
               quantile_cont(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.5)
                 AS median_cents_cont
        FROM events GROUP BY event_type
    """,
    "q_rank_windows": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        )
        SELECT event_id,
               RANK()       OVER (PARTITION BY event_type ORDER BY v) AS rnk,
               DENSE_RANK() OVER (PARTITION BY event_type ORDER BY v) AS drnk,
               NTILE(4)     OVER (PARTITION BY event_type ORDER BY v, event_id)
                 AS tile,
               CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY v, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS run_sum
        FROM c
    """,
    "q_skewness": """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        s AS (
          SELECT event_type,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(v AS HUGEINT)) AS s1,
                 sum(CAST(v AS HUGEINT) * v) AS s2,
                 sum(CAST(v AS HUGEINT) * v * v) AS s3
          FROM c GROUP BY event_type
        )
        SELECT event_type,
               CASE WHEN n >= 2 AND n * s2 - s1 * s1 > 0 THEN
                 floor(
                   CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                        AS DOUBLE)
                   / (CAST(n * s2 - s1 * s1 AS DOUBLE)
                      * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)))
                   * 1e8) / 1e8
               ELSE NULL END AS skew_r
        FROM s
    """,
    "q_minmax_norm": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        s AS (
          SELECT event_type, min(v) AS lo, max(v) AS hi
          FROM c GROUP BY event_type
        )
        SELECT event_id,
               CASE WHEN hi > lo THEN
                 floor(CAST(v - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
                       * 1e8) / 1e8
               ELSE NULL END AS mmn
        FROM c JOIN s USING (event_type)
    """,
    "q_weighted_avg": """
        WITH c AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS w,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p
          FROM lineitem
        ),
        s AS (
          SELECT l_returnflag,
                 CAST(sum(w) AS BIGINT) AS sw,
                 CAST(sum(w * p) AS BIGINT) AS swv
          FROM c GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) * 1e8) / 1e8
                 AS wavg_cents
        FROM s
    """,
    "q_zscore": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(v AS HUGEINT)) AS s1,
                 sum(CAST(v AS HUGEINT) * v) AS s2
          FROM c GROUP BY event_type
        )
        SELECT event_id,
               CASE WHEN n >= 2 AND n * s2 - s1 * s1 > 0 THEN
                 floor(
                   CAST(CAST(n AS HUGEINT) * v - s1 AS DOUBLE)
                   * (sqrt(n * (n - 1.0))
                      / (n * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))))
                   * 1e6) / 1e6
               ELSE NULL END AS z
        FROM c JOIN s USING (event_type)
    """,
    "q_dist_windows": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        )
        SELECT event_id,
               floor(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY v)
                     * 1e8) / 1e8 AS pct_rnk,
               floor(CUME_DIST() OVER (PARTITION BY event_type ORDER BY v)
                     * 1e8) / 1e8 AS cume,
               FIRST_VALUE(v) OVER (PARTITION BY event_type ORDER BY v, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv,
               LAST_VALUE(v) OVER (PARTITION BY event_type ORDER BY v, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
        FROM c
    """,
    "q_event_lag_delta": """
        WITH c AS (
          SELECT event_id, user_id, ts,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id,
               cents - lag(cents) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS delta_cents
        FROM c
    """,
    "q_case_bucket": """
        WITH c AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders
        )
        SELECT CASE WHEN cents < 1000000 THEN 'small'
                    WHEN cents < 2500000 THEN 'mid'
                    ELSE 'big' END AS bucket,
               CAST(sum(cents) AS BIGINT) AS sum_cents, count(*) AS n_orders
        FROM c GROUP BY 1
    """,
    "q_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority
    """,
    "q_status_pivot": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS total_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS total_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS total_p,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "q_above_avg": """
        SELECT event_type, count(*) AS n_events
        FROM events
        WHERE CAST(floor(value * 100.0 + 0.5) AS BIGINT)
              * (SELECT count(*) FROM events)
              > (SELECT CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT) FROM events)
        GROUP BY event_type
    """,
    "q_revenue_by_nation": """
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
                 AS BIGINT) AS revenue_micro,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    # hashing trick, md5 convention shared with the sampling ops
    "q_feature_hash": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        )
        SELECT doc_id,
               CAST(CAST(CONCAT('0x', substr(md5(w), 1, 16)) AS UBIGINT)
                    % 1024 AS BIGINT) AS feature,
               CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2
    """,
    "q_token_count": """
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    """,
    # same RE2 engine on both sides — counts agree exactly (incl. unicode)
    "q_bpe_tokens": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '''(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               )) AS n_bpe_tokens
        FROM documents
    """,
    "q_quality": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
               floor(
                 (least(len(string_split(text, ' ')), 200) / 200.0)
                 * (1 - length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                       / CAST(greatest(length(text), 1) AS DOUBLE))
                 * 10000.0
               ) / 10000.0 AS quality_score
        FROM documents
    """,
    "q_exact_dedup": """
        SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
               count(*) AS n_dups
        FROM documents GROUP BY 1
    """,
    "q_domain_cap": """
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 5
    """,
    # passage-level exact dedup (CCNet paragraph-dedup shape): every 20-word
    # window is a passage; a passage is kept only at its corpus-first
    # occurrence (global min of doc_id*2^20 + position)
    "q_sentences": """
        SELECT doc_id,
               CAST(generate_subscripts(
                 regexp_split_to_array(coalesce(text, ''), '[.!?]+\\s+'), 1
               ) AS BIGINT) AS sent_idx,
               unnest(regexp_split_to_array(coalesce(text, ''), '[.!?]+\\s+'))
                 AS sentence
        FROM documents
    """,
    "q_url_normalize": """
        WITH u AS (
          SELECT doc_id,
                 'HTTPS://WWW.' || source || '.Example.COM'
                 || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
                 || '/Path/' || doc_id
                 || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                         THEN '?utm_source=feed&id=' || (doc_id % 7)
                         ELSE '' END
                 || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
          FROM documents
        ),
        p AS (
          SELECT doc_id,
                 lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)', 1))
                   AS scheme,
                 regexp_replace(lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)', 2)),
                   '^www\\.', '') AS host,
                 regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)', 3)
                   AS path
          FROM u
        )
        SELECT doc_id,
               scheme || '://'
               || CASE WHEN scheme = 'https'
                       THEN regexp_replace(host, ':443$', '')
                       WHEN scheme = 'http'
                       THEN regexp_replace(host, ':80$', '')
                       ELSE host END
               || regexp_replace(path, '/+$', '') AS url_norm
        FROM p
    """,
    "q_fuzzy_match": """
        SELECT p_partkey, p_name,
               LEAST(levenshtein(p_name, 'smal ring'),
                     levenshtein(p_name, 'blue boltt'),
                     levenshtein(p_name, 'red gizmo')) AS min_lev
        FROM part
    """,
    "q_assortativity": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        d AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY node
        ),
        p AS (
          SELECT da.deg AS x, db.deg AS y
          FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b
          UNION ALL
          SELECT db.deg, da.deg
          FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b
        ),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x * y AS HUGEINT)) AS sxy,
                 sum(CAST(x * x AS HUGEINT)) AS sxx,
                 sum(CAST(y * y AS HUGEINT)) AS syy
          FROM p
        )
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS assort_r
        FROM s
    """,
    "q_degree_hist": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        d AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY node
        )
        SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
        FROM d GROUP BY deg
    """,
    "q_link_predict": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        adj AS (
          SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e
        ),
        cn AS (
          SELECT x.nb AS u, y.nb AS w, CAST(count(*) AS BIGINT) AS cn
          FROM adj x JOIN adj y ON x.v = y.v AND x.nb < y.nb
          GROUP BY 1, 2
        )
        SELECT cn.u, cn.w, cn.cn FROM cn
        LEFT JOIN e ON cn.u = e.a AND cn.w = e.b
        WHERE e.a IS NULL
        ORDER BY cn.cn DESC, cn.u, cn.w LIMIT 50
    """,
    # resource-allocation index as exact scaled integers: 2^40 // deg(center)
    "q_link_predict_ra": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        adj AS (
          SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e
        ),
        deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
        ra AS (
          SELECT x.nb AS u, y.nb AS w,
                 CAST(sum(1099511627776 // deg.d) AS BIGINT) AS ra
          FROM adj x
          JOIN adj y ON x.v = y.v AND x.nb < y.nb
          JOIN deg ON deg.v = x.v
          GROUP BY 1, 2
        )
        SELECT ra.u, ra.w, ra.ra FROM ra
        LEFT JOIN e ON ra.u = e.a AND ra.w = e.b
        WHERE e.a IS NULL
        ORDER BY ra.ra DESC, ra.u, ra.w LIMIT 50
    """,
    # jaccard as exact scaled integers: (2^40 * cn) // (du + dw - cn)
    "q_link_predict_jaccard": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        ),
        adj AS (
          SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e
        ),
        deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
        cn AS (
          SELECT x.nb AS u, y.nb AS w, CAST(count(*) AS BIGINT) AS cn
          FROM adj x JOIN adj y ON x.v = y.v AND x.nb < y.nb
          GROUP BY 1, 2
        ),
        jac AS (
          SELECT cn.u, cn.w,
                 CAST((1099511627776 * cn.cn)
                      // (du.d + dw.d - cn.cn) AS BIGINT) AS jaccard
          FROM cn
          JOIN deg du ON du.v = cn.u
          JOIN deg dw ON dw.v = cn.w
        )
        SELECT jac.u, jac.w, jac.jaccard FROM jac
        LEFT JOIN e ON jac.u = e.a AND jac.w = e.b
        WHERE e.a IS NULL
        ORDER BY jac.jaccard DESC, jac.u, jac.w LIMIT 50
    """,
    "q_connected_components": """
        WITH RECURSIVE comp(doc_id, comp) AS (
          SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT d.doc_id, c.comp FROM comp c
          JOIN documents d ON d.doc_id = c.doc_id + 1
          WHERE c.doc_id % 5 <> 4
        )
        SELECT doc_id AS mid, comp FROM comp
    """,
    "q_triangles": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        raw AS (
          SELECT doc_id AS u, (doc_id + 1) % (SELECT c FROM n) AS v
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents
        ),
        e AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v
        )
        SELECT count(*) AS triangles FROM e e1
        JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
    "q_passage_dedup": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 generate_subscripts(string_split(text, ' '), 1) - 1 AS i
          FROM documents
        ),
        chunks AS (
          SELECT doc_id, i // 20 AS pos, string_agg(word, ' ' ORDER BY i) AS passage
          FROM w GROUP BY doc_id, i // 20
        ),
        firsts AS (
          SELECT min(doc_id * 1048576 + pos) AS mo FROM chunks GROUP BY passage
        ),
        kept AS (
          SELECT (mo // 1048576) AS doc_id, count(*) AS kept_passages
          FROM firsts GROUP BY 1
        ),
        tot AS (
          SELECT doc_id, count(*) AS total_passages FROM chunks GROUP BY doc_id
        )
        SELECT t.doc_id AS doc_id, t.total_passages AS total_passages,
               coalesce(k.kept_passages, 0) AS kept_passages
        FROM tot t LEFT JOIN kept k USING (doc_id) ORDER BY doc_id
    """,
    # exact-substring self-dedup: distinct 13-token windows per doc vs the
    # corpus-first doc containing the identical window string
    "q_substring_dedup": """
        WITH tok AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS a
          FROM documents
        ),
        wins AS (
          SELECT doc_id, array_to_string(a[i:i+12], ' ') AS w
          FROM tok, unnest(range(1, len(a) - 11)) AS t(i)
        ),
        dw AS (SELECT DISTINCT doc_id, w FROM wins),
        f AS (SELECT w, min(doc_id) AS fd FROM dw GROUP BY w),
        per AS (
          SELECT dw.doc_id,
                 count(*) AS nw,
                 sum(CASE WHEN f.fd < dw.doc_id THEN 1 ELSE 0 END) AS nd
          FROM dw JOIN f USING (w)
          GROUP BY dw.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.nw, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(per.nd, 0) AS BIGINT) AS n_dup_windows
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    # boilerplate strip: same chunking CTE as q_passage_dedup, df >= 2
    # passages removed, docs rebuilt by position-ordered string_agg
    "q_boilerplate_strip": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS word,
                 generate_subscripts(string_split(coalesce(text, ''), ' '), 1) - 1 AS i
          FROM documents
        ),
        chunks AS (
          SELECT doc_id, i // 20 AS pos, string_agg(word, ' ' ORDER BY i) AS passage
          FROM w GROUP BY doc_id, i // 20
        ),
        df AS (
          SELECT passage, count(DISTINCT doc_id) AS df FROM chunks GROUP BY passage
        ),
        kept AS (
          SELECT c.doc_id, c.pos, c.passage
          FROM chunks c JOIN df USING (passage) WHERE df.df < 2
        ),
        agg AS (
          SELECT doc_id, string_agg(passage, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, count(*) AS n FROM chunks GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(coalesce(t.n, 0) - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
        FROM documents d
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN tot t USING (doc_id)
    """,
    # per-doc passage repetition: same chunking CTE as q_passage_dedup
    "q_intra_doc_repetition": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 generate_subscripts(string_split(text, ' '), 1) - 1 AS i
          FROM documents
        ),
        chunks AS (
          SELECT doc_id, i // 20 AS pos, string_agg(word, ' ' ORDER BY i) AS passage
          FROM w GROUP BY doc_id, i // 20
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS total_passages,
               CAST(count(DISTINCT passage) AS BIGINT) AS distinct_passages
        FROM chunks GROUP BY doc_id
    """,
    # benchmark decontamination: distinct char-13-gram overlap counts
    # (substr is 1-based; last valid start is length - 12)
    "q_decontaminate": """
        WITH probe AS (
          SELECT DISTINCT substr(text, CAST(i AS INTEGER), 13) AS g
          FROM documents, UNNEST(range(1, length(text) - 11)) AS t(i)
          WHERE doc_id < 25
        ),
        corp AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 13) AS g
          FROM documents, UNNEST(range(1, length(text) - 11)) AS t(i)
          WHERE doc_id >= 25
        )
        SELECT doc_id, count(*) AS n_hits
        FROM corp JOIN probe USING (g) GROUP BY 1
    """,
    # BM25 (Lucene/ATIRE idf) with the engine's EXACT float expression
    # tree: scalar idf/avgdl from exact ints, per-term contributions added
    # in fixed query order, floor4 at the end; (1.2 + 1.0) stays written as
    # a SUM (the literal 2.2 rounds differently than 1.2 + 1.0)
    "q_bm25_topk": """
        WITH tok AS (
          SELECT doc_id,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        stats AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS dl,
                 CAST(count(*) FILTER (WHERE term = 'join') AS BIGINT) AS tf0,
                 CAST(count(*) FILTER (WHERE term = 'vector') AS BIGINT) AS tf1,
                 CAST(count(*) FILTER (WHERE term = 'customer') AS BIGINT) AS tf2
          FROM tok GROUP BY doc_id
        ),
        c AS (
          SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT CAST(coalesce(sum(dl), 0) AS BIGINT) FROM stats) AS sdl,
                 (SELECT count(*) FROM stats WHERE tf0 > 0) AS df0,
                 (SELECT count(*) FROM stats WHERE tf1 > 0) AS df1,
                 (SELECT count(*) FROM stats WHERE tf2 > 0) AS df2
        ),
        scored AS (
          SELECT s.doc_id,
                 floor((
                   ln(1 + (c.n - c.df0 + 0.5) / (c.df0 + 0.5))
                     * (s.tf0 * (1.2 + 1.0))
                     / (s.tf0 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                          / (CAST(c.sdl AS DOUBLE) / CAST(c.n AS DOUBLE))))
                 + ln(1 + (c.n - c.df1 + 0.5) / (c.df1 + 0.5))
                     * (s.tf1 * (1.2 + 1.0))
                     / (s.tf1 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                          / (CAST(c.sdl AS DOUBLE) / CAST(c.n AS DOUBLE))))
                 + ln(1 + (c.n - c.df2 + 0.5) / (c.df2 + 0.5))
                     * (s.tf2 * (1.2 + 1.0))
                     / (s.tf2 + 1.2 * (1.0 - 0.75 + 0.75 * s.dl
                          / (CAST(c.sdl AS DOUBLE) / CAST(c.n AS DOUBLE))))
                 ) * 10000.0) / 10000.0 AS score
          FROM stats s, c
          WHERE s.tf0 + s.tf1 + s.tf2 > 0
        )
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    # token-level decontamination (canonical GPT-3 form): exact 13-TOKEN
    # windows (single-space split, occurrences counted — the char variant
    # above counts distinct grams); bench slice spread by doc_id % 100
    "q_decontaminate_tokens": """
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS a FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(a[i:i+12], ' ') AS g
          FROM tok, unnest(range(1, len(a) - 11)) AS t(i)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 100 < 2)
        SELECT doc_id, count(*) AS n_hits
        FROM grams JOIN bench USING (g)
        WHERE doc_id % 100 >= 2
        GROUP BY doc_id
    """,
    # exact 5-gram Jaccard ≥ 0.8 pairs: the engine's prefix-filter join vs a
    # full O(n²) shingle self-join (char shingles == byte shingles on this
    # ASCII corpus; docs shorter than 5 chars have no shingles on either side)
    # exact Levenshtein ≤ 2 fuzzy self-join on the bounded name slice: the
    # engine's FastSS deletion-neighborhood blocking vs the O(n²) oracle
    "q_editdist_names": """
        WITH s AS (
          SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 300
        )
        SELECT x.c_custkey AS a, y.c_custkey AS b,
               CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS dist
        FROM s x JOIN s y ON x.c_custkey < y.c_custkey
        WHERE levenshtein(x.c_name, y.c_name) <= 2
        ORDER BY a, b
    """,
    "q_ngram_jaccard_1k": """
        WITH sh AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS g
          FROM documents, UNNEST(range(1, length(text) - 3)) AS t(i)
          WHERE doc_id < 1000
        ),
        sizes AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               floor(i / CAST(sa.s + sb.s - i AS DOUBLE) * 10000.0) / 10000.0
                 AS jaccard_r
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / CAST(sa.s + sb.s - i AS DOUBLE) >= 0.8
    """,
    # same RE2 engine both sides; email masked first, then phone runs on the
    # already-masked text (order pinned in stages/textops.py:add_pii_masked)
    "q_pii_mask": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\+?[0-9][0-9\-\s()]{6,}[0-9]')) AS n_phones,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\+?[0-9][0-9\-\s()]{6,}[0-9]', '<PHONE>', 'g') AS masked_text
        FROM documents
    """,
    # Gopher-rule gates (ratios floor4-canonicalized on both sides; the keep
    # gate compares the canonicalized values)
    "q_gopher_quality": r"""
        WITH g AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 floor(length(replace(text, ' ', ''))
                       / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)
                       * 10000.0) / 10000.0 AS mean_word_len,
                 floor((len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\.\.\.')))
                       / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)
                       * 10000.0) / 10000.0 AS symbol_ratio
          FROM documents)
        SELECT doc_id, n_tokens, mean_word_len, symbol_ratio,
               (n_tokens BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND symbol_ratio < 0.1) AS gopher_keep
        FROM g
    """,
    # identical NFC/lower/RE2 pipeline on both sides (utf8proc vs ICU agree
    # on this corpus; trim(characters=" ") == SQL trim)
    "q_norm_text": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
                 AS norm_text
        FROM documents
    """,
    # ASCII [A-Za-z0-9]+ token runs lowercased per token — lower() is
    # ASCII-only on both sides by construction; ties broken by term
    "q_top_terms": """
        WITH toks AS (
          SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        )
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY term
        ORDER BY cnt DESC, term ASC
        LIMIT 50
    """,
    # same ASCII token convention as q_top_terms; postings compared as the
    # ORDER BY doc_id string_agg so the list order is part of the contract
    "q_inverted_index": """
        WITH toks AS (
          SELECT doc_id,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        per AS (
          SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM toks GROUP BY term, doc_id
        )
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS tf,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                 AS postings
        FROM per GROUP BY term ORDER BY term
    """,
    "q_top_terms_by_source": """
        WITH toks AS (
          SELECT source,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        g AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY source, term
        )
        SELECT source, term, cnt FROM g
        QUALIFY row_number() OVER (
          PARTITION BY source ORDER BY cnt DESC, term
        ) <= 5
    """,
    "q_ratio_to_report": """
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        s AS (
          SELECT event_type, CAST(sum(v) AS BIGINT) AS s
          FROM c GROUP BY event_type
        )
        SELECT event_id,
               floor(CAST(v AS DOUBLE) / CAST(s AS DOUBLE) * 1e8) / 1e8
                 AS share
        FROM c JOIN s USING (event_type)
    """,
    "q_cluster_inertia": """
        WITH x AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        ),
        c AS (
          SELECT label, dim,
                 floor(sum(v) / count(*) * 1e6) / 1e6 AS c
          FROM x GROUP BY label, dim
        )
        SELECT x.label,
               floor(sum((v - c) * (v - c)) * 1e4) / 1e4 AS inertia_r
        FROM x JOIN c USING (label, dim)
        GROUP BY x.label
    """,
    "q_centroid_per_label": """
        WITH x AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        )
        SELECT label, dim,
               floor(sum(v) / count(*) * 1e6) / 1e6 AS c
        FROM x GROUP BY label, dim
    """,
    "q_winsorized_mean": """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events
        ),
        q AS (
          SELECT event_type,
                 CAST(quantile_disc(v, 0.1) AS BIGINT) AS lo,
                 CAST(quantile_disc(v, 0.9) AS BIGINT) AS hi
          FROM c GROUP BY event_type
        )
        SELECT c.event_type,
               floor(CAST(sum(least(greatest(v, lo), hi)) AS DOUBLE)
                     / count(*) * 1e8) / 1e8 AS wmean
        FROM c JOIN q USING (event_type)
        GROUP BY c.event_type
    """,
    "q_user_entropy": """
        WITH c AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ),
        t AS (
          SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n,
                 sum(cnt * ln(cnt)) AS s
          FROM c GROUP BY user_id
        )
        SELECT user_id, floor((ln(n) - s / n) * 1e4) / 1e4 AS entropy_r
        FROM t
    """,
    "q_retention": """
        WITH e AS (
          SELECT user_id,
                 CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS ym
          FROM events
        ),
        c AS (SELECT user_id, min(ym) AS cym FROM e GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, ym FROM e)
        SELECT cym AS cohort_day, ym - cym AS days_since,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    "q_encode_tokens": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term,
                 CAST(generate_subscripts(
                   string_split(coalesce(text, ''), ' '), 1) AS BIGINT) - 1
                   AS pos
          FROM documents
        ),
        cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
        vocab AS (
          SELECT term,
                 CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT)
                   AS tid
          FROM cnt QUALIFY tid <= 20
        )
        SELECT doc_id, pos, coalesce(v.tid, 0) AS tid
        FROM tok LEFT JOIN vocab v USING (term)
    """,
    "q_top_bigrams": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS term,
                 CAST(generate_subscripts(
                   string_split(coalesce(text, ''), ' '), 1) AS BIGINT)
                   AS pos
          FROM documents
        )
        SELECT a.term || ' ' || b.term AS bigram,
               CAST(count(*) AS BIGINT) AS n
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
    "q_dense_grid": """
        WITH e AS (
          SELECT CAST(user_id AS BIGINT) AS user_id,
                 CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
          FROM events
        ),
        g AS (
          SELECT t.user_id, d.day
          FROM (SELECT DISTINCT user_id FROM e) t
          CROSS JOIN (SELECT DISTINCT day FROM e) d
        ),
        c AS (
          SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2
        )
        SELECT g.user_id, g.day, coalesce(c.n, 0) AS n
        FROM g LEFT JOIN c USING (user_id, day)
    """,
    "q_funnel": """
        WITH m AS (
          SELECT user_id,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'view'))
                      AS BIGINT) AS t1,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'click'))
                      AS BIGINT) AS t2,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'purchase'))
                      AS BIGINT) AS t3
          FROM events GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_converted
        FROM m WHERE t1 < t2 AND t2 < t3
    """,
    "q_time_to_convert": """
        WITH m AS (
          SELECT user_id,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'view'))
                      AS BIGINT) AS t1,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'click'))
                      AS BIGINT) AS t2,
                 CAST(epoch_us(min(ts) FILTER (event_type = 'purchase'))
                      AS BIGINT) AS t3
          FROM events GROUP BY user_id
        ),
        d AS (SELECT t3 - t1 AS delta FROM m WHERE t1 < t2 AND t2 < t3)
        SELECT CAST(quantile_disc(delta, 0.5) AS BIGINT) AS p50_us,
               CAST(quantile_disc(delta, 0.9) AS BIGINT) AS p90_us
        FROM d
    """,
    "q_latest_event": """
        SELECT user_id, event_id, event_type, ts FROM events
        QUALIFY row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id) = 1
    """,
    "q_full_outer": """
        WITH lo AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_lo
          FROM events WHERE user_id < 100 GROUP BY user_id
        ),
        hi AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_hi
          FROM events WHERE user_id >= 50 GROUP BY user_id
        )
        SELECT coalesce(lo.user_id, hi.user_id) AS user_id,
               coalesce(n_lo, -1) AS n_lo,
               coalesce(n_hi, -1) AS n_hi
        FROM lo FULL OUTER JOIN hi ON lo.user_id = hi.user_id
    """,
    # the sketch path's output is exact top-k by construction (candidate
    # upper/lower-bound pruning + exact recount) — same oracle as q_top_terms
    "q_top_terms_sketch": """
        WITH toks AS (
          SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        )
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY term
        ORDER BY cnt DESC, term ASC
        LIMIT 50
    """,
    # rational tf*N/df score, left-associated doubles — floor4 is exact on
    # both engines because no transcendental (ln) enters the expression
    "q_tfidf": """
        WITH tc AS (
          SELECT doc_id,
                 lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tc GROUP BY doc_id, term
        ),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               floor(CAST(tf.tf AS DOUBLE) * (SELECT count(*) FROM documents)
                     / df.df * 10000.0) / 10000.0 AS tfidf_r
        FROM tf JOIN df ON tf.term = df.term
    """,
    # deterministic hash sampling: bucket = first 16 md5 hex chars as uint64
    # mod 1e6 — the exact predicate stages/sampling.py applies per batch
    "q_sample_uniform": """
        SELECT doc_id, source FROM documents
        WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                   AS UBIGINT) % 1000000 < 100000
    """,
    "q_sample_stratified_exact": """
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY
                   CAST(CONCAT('0x',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT),
                   doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM documents
        ) WHERE rn <= (n + 4) // 5
    """,
    "q_sample_weighted": """
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, n_tokens FROM t
        WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                   AS UBIGINT) % 1000000
              < least(n_tokens / 500.0, 1.0) * 1000000
    """,
    "q_sample_stratified": """
        SELECT doc_id, source FROM documents
        WHERE CAST(CONCAT('0x',
                   substr(md5(CONCAT(source, '|', CAST(doc_id AS VARCHAR))), 1, 16))
                   AS UBIGINT) % 1000000 < 200000
    """,
    # 64-token windows at stride 32: 1-based inclusive list slice
    # a[k·32+1 : k·32+64]; k ranges over ⌈len/32⌉ window starts
    "q_chunk_windows": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents)
        SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
               array_to_string(a[k*32+1 : k*32+64], ' ') AS chunk
        FROM tok, unnest(range(0, (len(a) + 31) // 32)) AS t(k)
    """,
    # token-budget shards: exclusive running token total // 4096 — the
    # SUM window is HUGEINT in DuckDB, cast back to BIGINT for schema parity
    "q_token_shards": """
        WITH t AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
          FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
                 AS cum_tokens,
               CAST((CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
                     - n_tokens) // 4096 AS BIGINT) AS shard
        FROM t
    """,
    # 90/5/5 split assignment: same md5 bucket as the samplers, cumulative
    # integer cutoffs (90·1e6/100, 95·1e6/100)
    "q_split_assign": """
        SELECT doc_id, source,
               CASE
                 WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                      AS UBIGINT) % 1000000 < 900000 THEN 'train'
                 WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                      AS UBIGINT) % 1000000 < 950000 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    """,
    "q_knn_top10": f"""
        SELECT vec_id,
               floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            {_KNN_SQL_LITERAL}) * 10000.0) / 10000.0 AS cos_r
        FROM embeddings
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        {_KNN_SQL_LITERAL}) DESC, vec_id ASC
        LIMIT 10
    """,
    # SQ8 ANN with exact rescore: the candidate pool covers the true top-10
    # on this data, so the result is the exact top-k (same oracle shape as
    # q_knn_top10); the pytest recall/exactness suite is tests/test_sq8.py
    "q_knn_sq8": f"""
        SELECT vec_id,
               floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            {_KNN_SQL_LITERAL}) * 10000.0) / 10000.0 AS cos_r
        FROM embeddings
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        {_KNN_SQL_LITERAL}) DESC, vec_id ASC
        LIMIT 10
    """,
    "q_knn_pq": f"""
        SELECT vec_id,
               floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            {_KNN_SQL_LITERAL}) * 10000.0) / 10000.0 AS cos_r
        FROM embeddings
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        {_KNN_SQL_LITERAL}) DESC, vec_id ASC
        LIMIT 10
    """,
    "q_neardup_pairs": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) * 10000.0) / 10000.0 AS cos_r
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= {NEARDUP_THRESHOLD}
    """,
    # semantic decontamination: corpus × benchmark-slice cosine pairs
    # (linear in the corpus on the engine side — one matmul per block
    # against the broadcast bench matrix)
    "q_decontaminate_semantic": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) * 10000.0) / 10000.0 AS cos_r
        FROM embeddings a JOIN embeddings b ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= {NEARDUP_THRESHOLD}
    """,
    # Flagship KG outputs vs the committed golden graph (golden/*.parquet):
    # the exact nodes/edges kg_build emits for the deterministic 500-page
    # table _kg_result derives from the sf0.001/sf0.01 documents row count
    # (both 500 rows -> identical pages, seed 42).  The golden itself is
    # gated by tests/test_e2e_golden.py (P/R == 1.0 vs the sequential
    # oracle), so this closes the driver's independent check on the
    # engine's headline artifact.  Reference anchor: the unified
    # Nodes/Relation tables, kuzu_init.py:92-135.
    "q_kg_nodes_by_type": f"""
        SELECT type, count(*) AS n_nodes
        FROM read_parquet('{_GOLDEN_DIR}/kg_nodes_500pages.parquet')
        GROUP BY type
    """,
    "q_kg_edges_by_type": f"""
        SELECT type, max(strength) AS max_strength, count(*) AS n_edges
        FROM read_parquet('{_GOLDEN_DIR}/kg_edges_500pages.parquet')
        GROUP BY type
    """,
}

QUERIES = {
    "q_filter_project": q_filter_project,
    "q_point_lookup": q_point_lookup,
    "q_groupby_count": q_groupby_count,
    "q_doc_stats_by_source": q_doc_stats_by_source,
    "q_topk_events": q_topk_events,
    "q_sorted_limit": q_sorted_limit,
    "q_join_agg": q_join_agg,
    "q_left_join": q_left_join,
    "q_rollup_revenue": q_rollup_revenue,
    "q_cube_events": q_cube_events,
    "q_rrf_fusion": q_rrf_fusion,
    "q_semi_join": q_semi_join,
    "q_set_ops": q_set_ops,
    "q_bloom_semi_join": q_bloom_semi_join,
    "q_anti_join": q_anti_join,
    "q_lineitem_agg": q_lineitem_agg,
    "q_events_hourly": q_events_hourly,
    "q_sessionize": q_sessionize,
    "q_asof_join": q_asof_join,
    "q_asof_forward": q_asof_forward,
    "q_range_join": q_range_join,
    "q_rolling_sum": q_rolling_sum,
    "q_top3_orders": q_top3_orders,
    "q_value_median": q_value_median,
    "q_value_p90": q_value_p90,
    "q_outliers_iqr": q_outliers_iqr,
    "q_weighted_median": q_weighted_median,
    "q_mad": q_mad,
    "q_table_diff": q_table_diff,
    "q_unpivot": q_unpivot,
    "q_value_p90_hist": q_value_p90_hist,
    "q_value_median_cont": q_value_median_cont,
    "q_profile_events": q_profile_events,
    "q_mode_per_user": q_mode_per_user,
    "q_user_journey": q_user_journey,
    "q_corr_qty_price": q_corr_qty_price,
    "q_ols_per_flag": q_ols_per_flag,
    "q_json_extract": q_json_extract,
    "q_cooccur_parts": q_cooccur_parts,
    "q_basket_lift": q_basket_lift,
    "q_first_last": q_first_last,
    "q_sssp": q_sssp,
    "q_harmonic_parts": q_harmonic_parts,
    "q_skyline": q_skyline,
    "q_mutual_nn": q_mutual_nn,
    "q_quota_sample": q_quota_sample,
    "q_keyness_chi2": q_keyness_chi2,
    "q_twap": q_twap,
    "q_gini": q_gini,
    "q_source_overlap": q_source_overlap,
    "q_mad_by_type": q_mad_by_type,
    "q_lm_perplexity": q_lm_perplexity,
    "q_lexical_diversity": q_lexical_diversity,
    "q_pmi_bigrams": q_pmi_bigrams,
    "q_clustering_coeff": q_clustering_coeff,
    "q_interval_coverage": q_interval_coverage,
    "q_pack_sequences": q_pack_sequences,
    "q_resample_locf": q_resample_locf,
    "q_containment": q_containment,
    "q_token_commonness": q_token_commonness,
    "q_hopping_window": q_hopping_window,
    "q_event_lag_delta": q_event_lag_delta,
    "q_rank_windows": q_rank_windows,
    "q_transition_matrix": q_transition_matrix,
    "q_cumulative_distinct": q_cumulative_distinct,
    "q_dist_windows": q_dist_windows,
    "q_zscore": q_zscore,
    "q_skewness": q_skewness,
    "q_weighted_avg": q_weighted_avg,
    "q_minmax_norm": q_minmax_norm,
    "q_case_bucket": q_case_bucket,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_order_priority": q_order_priority,
    "q_status_pivot": q_status_pivot,
    "q_above_avg": q_above_avg,
    "q_distinct_users": q_distinct_users,
    "q_token_count": q_token_count,
    "q_feature_hash": q_feature_hash,
    "q_bpe_tokens": q_bpe_tokens,
    "q_quality": q_quality,
    "q_editdist_names": q_editdist_names,
    "q_exact_dedup": q_exact_dedup,
    "q_domain_cap": q_domain_cap,
    "q_passage_dedup": q_passage_dedup,
    "q_substring_dedup": q_substring_dedup,
    "q_boilerplate_strip": q_boilerplate_strip,
    "q_sentences": q_sentences,
    "q_url_normalize": q_url_normalize,
    "q_fuzzy_match": q_fuzzy_match,
    "q_triangles": q_triangles,
    "q_connected_components": q_connected_components,
    "q_link_predict": q_link_predict,
    "q_link_predict_ra": q_link_predict_ra,
    "q_link_predict_jaccard": q_link_predict_jaccard,
    "q_degree_hist": q_degree_hist,
    "q_assortativity": q_assortativity,
    "q_intra_doc_repetition": q_intra_doc_repetition,
    "q_decontaminate": q_decontaminate,
    "q_decontaminate_tokens": q_decontaminate_tokens,
    "q_bm25_topk": q_bm25_topk,
    "q_split_assign": q_split_assign,
    "q_chunk_windows": q_chunk_windows,
    "q_token_shards": q_token_shards,
    "q_ngram_jaccard_1k": q_ngram_jaccard_1k,
    "q_pii_mask": q_pii_mask,
    "q_gopher_quality": q_gopher_quality,
    "q_norm_text": q_norm_text,
    "q_top_terms": q_top_terms,
    "q_top_terms_by_source": q_top_terms_by_source,
    "q_inverted_index": q_inverted_index,
    "q_full_outer": q_full_outer,
    "q_latest_event": q_latest_event,
    "q_funnel": q_funnel,
    "q_time_to_convert": q_time_to_convert,
    "q_dense_grid": q_dense_grid,
    "q_encode_tokens": q_encode_tokens,
    "q_top_bigrams": q_top_bigrams,
    "q_retention": q_retention,
    "q_user_entropy": q_user_entropy,
    "q_winsorized_mean": q_winsorized_mean,
    "q_centroid_per_label": q_centroid_per_label,
    "q_ratio_to_report": q_ratio_to_report,
    "q_cluster_inertia": q_cluster_inertia,
    "q_top_terms_sketch": q_top_terms_sketch,
    "q_tfidf": q_tfidf,
    "q_sample_uniform": q_sample_uniform,
    "q_sample_stratified": q_sample_stratified,
    "q_sample_weighted": q_sample_weighted,
    "q_sample_stratified_exact": q_sample_stratified_exact,
    "q_knn_top10": q_knn_top10,
    "q_knn_sq8": q_knn_sq8,
    "q_knn_pq": q_knn_pq,
    "q_neardup_pairs": q_neardup_pairs,
    "q_decontaminate_semantic": q_decontaminate_semantic,
    # rows-only (no SQL oracle)
    "q_dedup_keep_best": q_dedup_keep_best,
    "q_distinct_users_hll": q_distinct_users_hll,
    "q_distinct_users_hll_by_type": q_distinct_users_hll_by_type,
    "q_lang_id": q_lang_id,
    "q_rolling_fp": q_rolling_fp,
    "q_simhash": q_simhash,
    "q_minhash_lsh": q_minhash_lsh,
    "q_ivf_knn": q_ivf_knn,
    "q_hnsw_knn": q_hnsw_knn,
    "q_kmeans": q_kmeans,
    "q_quality_classifier": q_quality_classifier,
    "q_bpe_train": q_bpe_train,
    "q_data_audit": q_data_audit,
    "q_curate_corpus": q_curate_corpus,
    "q_pca": q_pca,
    "q_semdedup": q_semdedup,
    "q_neardup_lsh": q_neardup_lsh,
    "q_kg_pagerank": q_kg_pagerank,
    "q_kg_pagerank_weighted": q_kg_pagerank_weighted,
    "q_kg_hits": q_kg_hits,
    "q_kg_ppr": q_kg_ppr,
    "q_phash_neardup": q_phash_neardup,
    "q_audio_neardup": q_audio_neardup,
    "q_kg_centrality": q_kg_centrality,
    "q_kg_betweenness": q_kg_betweenness,
    "q_kg_nodes_by_type": q_kg_nodes_by_type,
    "q_kg_edges_by_type": q_kg_edges_by_type,
    "q_kg_search": q_kg_search,
    "q_kg_linking": q_kg_linking,
    "q_kg_khop": q_kg_khop,
    "q_kg_communities": q_kg_communities,
    "q_kg_kcore": q_kg_kcore,
    "q_kg_walks": q_kg_walks,
    "q_kg_ego": q_kg_ego,
}

# Machine-readable oracle map for the rows-only queries (no SQL-expressible
# DuckDB oracle): each entry names the pytest test(s) that independently
# verify the operator's semantics, so "no_oracle" in the driver report never
# means "untested".
PYTEST_ORACLES: dict[str, list[str]] = {
    "q_distinct_users_hll": [
        "tests/test_hll.py::test_hll_accuracy_int_column",
        "tests/test_hll.py::test_hll_duplicates_and_partitioning_invariant",
        "tests/test_hll.py::test_hll_string_and_composite_columns",
    ],
    "q_distinct_users_hll_by_type": [
        "tests/test_hll.py::test_grouped_hll_accuracy_and_invariance",
    ],
    "q_lang_id": [
        "tests/test_driver_contract.py::test_lang_id_heuristic_on_real_sentences",
        "tests/test_driver_contract.py::test_lang_id_deterministic",
    ],
    "q_rolling_fp": [
        "tests/test_textops.py::test_rolling_fingerprint_properties",
    ],
    "q_simhash": [
        "tests/test_dedup_knn.py::test_simhash_near_vs_far",
        "tests/test_dedup_knn.py::test_add_simhash_column",
    ],
    "q_dedup_keep_best": [
        "tests/test_dedup_knn.py::test_dedup_keep_best_representatives",
    ],
    "q_minhash_lsh": [
        "tests/test_dedup_knn.py::test_minhash_lsh_clusters_near_dups",
    ],
    "q_ivf_knn": [
        "tests/test_dedup_knn.py::test_ivf_assign_partitions_and_search_recall",
        "tests/test_dedup_knn.py::test_ivf_persisted_index_prunes_and_full_probe_is_exact",
    ],
    "q_hnsw_knn": [
        "tests/test_nsw.py::test_nsw_index_build_query_and_recall",
        "tests/test_nsw.py::test_beam_search_full_pool_is_exact",
        "tests/test_nsw.py::test_q_hnsw_knn_matches_exact_at_small_scale",
    ],
    "q_curate_corpus": [
        "tests/test_corpus.py::test_curate_corpus_ledger_and_export",
    ],
    "q_bpe_train": [
        "tests/test_bpe.py::test_bpe_matches_bruteforce_reference",
        "tests/test_bpe.py::test_word_frequencies_partition_invariant",
        "tests/test_bpe.py::test_bpe_encode_roundtrip",
    ],
    "q_quality_classifier": [
        "tests/test_ml.py::test_logreg_learns_separable_data",
        "tests/test_ml.py::test_logreg_partition_and_regime_invariance",
        "tests/test_ml.py::test_quality_classifier_query_learns_the_rule",
    ],
    "q_kmeans": [
        "tests/test_dedup_knn.py::test_kmeans_recovers_separated_blobs",
    ],
    "q_pca": [
        "tests/test_pca.py::test_pca_fit_matches_numpy",
        "tests/test_pca.py::test_pca_transform_projects_exactly",
        "tests/test_pca.py::test_pca_partition_invariance_allclose",
    ],
    "q_semdedup": [
        "tests/test_semdedup.py::test_semdedup_matches_bruteforce",
        "tests/test_semdedup.py::test_semdedup_partition_invariance",
        "tests/test_semdedup.py::test_q_semdedup_contract",
    ],
    "q_neardup_lsh": [
        "tests/test_dedup_knn.py::test_neardup_lsh_subset_of_exact_with_high_recall",
    ],
    "q_kg_pagerank": [
        "tests/test_embedder_query_multimodal.py::test_pagerank_matches_dense_reference",
    ],
    "q_kg_pagerank_weighted": [
        "tests/test_graph_sharded.py::test_weighted_pagerank_matches_reference_all_regimes",
    ],
    "q_kg_hits": [
        "tests/test_hits.py::test_hits_matches_dense_reference",
        "tests/test_hits.py::test_hits_regime_equality",
    ],
    "q_kg_ppr": [
        "tests/test_hits.py::test_personalized_pagerank_matches_dense_reference",
    ],
    "q_phash_neardup": [
        "tests/test_phash.py::test_phash_neardup_matches_bruteforce",
        "tests/test_phash.py::test_bmp_roundtrip_byte_exact",
    ],
    "q_audio_neardup": [
        "tests/test_phash.py::test_wav_roundtrip_and_audio_fingerprint_neardup",
    ],
    "q_kg_centrality": [
        "tests/test_kcore.py::test_harmonic_centrality_matches_bfs_reference",
    ],
    "q_kg_betweenness": [
        "tests/test_betweenness.py::test_betweenness_matches_reference_random_graph",
        "tests/test_betweenness.py::test_betweenness_partition_and_duplicate_invariance",
        "tests/test_betweenness.py::test_betweenness_pivot_estimator",
    ],
    "q_kg_search": [
        "tests/test_embedder_query_multimodal.py::test_search_finds_self",
    ],
    "q_kg_linking": [
        "tests/test_linking.py::test_q_kg_linking_pairs_complete",
        "tests/test_linking.py::test_scored_candidates_find_variants_and_respect_type",
    ],
    "q_kg_khop": [
        "tests/test_embedder_query_multimodal.py::test_khop_matches_bfs_reference",
    ],
    "q_kg_communities": [
        "tests/test_embedder_query_multimodal.py::test_label_propagation_matches_reference",
    ],
    "q_kg_kcore": [
        "tests/test_kcore.py::test_kcore_random_graph_matches_peeling",
        "tests/test_kcore.py::test_kcore_regime_equality",
    ],
    "q_kg_walks": [
        "tests/test_embedder_query_multimodal.py::test_random_walks_deterministic_and_valid",
    ],
    "q_kg_ego": [
        "tests/test_embedder_query_multimodal.py::test_ego_subgraph_matches_reference",
    ],
}
