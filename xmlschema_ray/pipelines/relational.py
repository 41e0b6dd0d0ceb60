"""Oracle-checked relational pipelines over the driver testdata tables.

These exercise the engine's general operator inventory (SURVEY.md §2:
scans with pruning, per-batch maps, combiner aggregation, broadcast and
partitioned joins, top-k, windows, sessionization, JSON extraction) with
DuckDB-verifiable semantics. Money arithmetic follows the scaled-integer
rule in ``common.py`` so values match the oracle exactly.

Every function takes ``sf_dir`` and returns a Dataset / DataFrame;
``ORACLES[name]`` is the matching SQL (same column names — required by the
driver's order-insensitive value-hash compare).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from xmlschema_ray.ops.relational import broadcast_join, combiner_aggregate, topk
from xmlschema_ray.pipelines.common import (
    cents,
    layout_cache_fresh,
    scaled_int,
    sorted_or_typed_empty,
    table_path,
)


# -- q1: pricing summary (combiner aggregate; TPC-H Q1 shape) ------------


def _revenue_map(li: "rd.Dataset", key: str = "l_orderkey") -> "rd.Dataset":
    """lineitem → (key, rev_e4) with floor(x*100+0.5) scaled-int
    arithmetic done in Arrow kernels — zero-copy on the fact-table side of
    every revenue join/aggregate (same arithmetic as ``common.cents``)."""

    def revenue_e4(batch: pa.Table) -> pa.Table:
        p100 = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["l_extendedprice"], 100.0), 0.5)), pa.int64()
        )
        d100 = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["l_discount"], 100.0), 0.5)), pa.int64()
        )
        rev = pc.multiply(p100, pc.subtract(pa.scalar(100, pa.int64()), d100))
        return pa.table({key: batch[key], "rev_e4": rev})

    return li.map_batches(revenue_e4, batch_format="pyarrow", zero_copy_batch=True)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped pricing summary with integer-scaled partial aggregation.

    Per-batch partials (one row per group per batch) flow into a tiny
    groupby — the pre-aggregate-before-shuffle pattern (SURVEY §2.7).
    """
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def add_scaled(batch: pd.DataFrame) -> pd.DataFrame:
        price_c = cents(batch["l_extendedprice"])
        disc100 = scaled_int(batch["l_discount"], 100.0)
        out = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": batch["l_quantity"].astype("int64"),
                "price_c": price_c,
                "disc_e4": price_c * (100 - disc100),  # price*(1-disc) in 1e-4 $
                "disc100": disc100,
            }
        )
        return out

    scaled = ds.map_batches(add_scaled, batch_format="pandas")
    agg = combiner_aggregate(
        scaled,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("qty", "sum"),
            "sum_base_c": ("price_c", "sum"),
            "sum_disc_e4": ("disc_e4", "sum"),
            "sum_disc100": ("disc100", "sum"),
            "count_order": (None, "count"),
        },
    )
    df = agg.to_pandas()
    n = df["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["sum_qty"].astype("int64"),
            "sum_base_price": df["sum_base_c"] / 100.0,
            "sum_disc_price": df["sum_disc_e4"] / 10000.0,
            "avg_qty": df["sum_qty"] / n,
            "avg_price": df["sum_base_c"] / (100.0 * n),
            "avg_disc": df["sum_disc100"] / (100.0 * n),
            "count_order": n,
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_price,
  CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- q3: top revenue orders (broadcast joins + combiner agg + top-k) -----


# Adaptive-plan switch (the engine's driver_threshold_bytes pattern,
# engine.py): below this on-disk size the dimension/fact side is collected
# and broadcast (fixed-cost-free at test scale); above it the plan is fully
# distributed — tests force 0 to prove both plans produce identical output.
DISTRIBUTED_THRESHOLD_BYTES = 256 << 20


def q3_top_orders(
    sf_dir: str, distributed_threshold_bytes: Optional[int] = None
) -> pd.DataFrame:
    """Top-10 BUILDING-segment orders by discounted revenue.

    Distributed plan (orders past the size threshold): the BUILDING
    customer key set broadcasts only while the CUSTOMER table itself is
    under the gate (dimension keys, ``ray.put`` once); past it — at 100×
    a "dimension" stops being one — the segment keys stay a Dataset and
    the membership filter runs through one co-partitioning exchange
    (``semi_join_copartitioned``). The date-filtered orders fact streams
    through that semi-join and hash-joins the pre-aggregated lineitem
    revenue — no fact table is ever collected on the driver. Below the
    threshold the orders side is collected and broadcast instead (one
    shuffle fewer). ``tests/test_distributed_paths.py`` forces
    threshold=0 to prove all paths identical."""
    from xmlschema_ray.ops.relational import (
        hash_bucket_join,
        semi_join,
        semi_join_copartitioned,
    )

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DISTRIBUTED_THRESHOLD_BYTES
    building_keys_ds = (
        rd.read_parquet(
            table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
        )
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    orders_src = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pa.scalar(pd.Timestamp("1998-01-01"))),
    )
    if os.path.getsize(table_path(sf_dir, "customer")) <= distributed_threshold_bytes:
        orders = semi_join(
            orders_src, building_keys_ds.to_pandas(), on="o_custkey", key="c_custkey"
        )
    else:
        orders = semi_join_copartitioned(
            orders_src, building_keys_ds, "o_custkey", "c_custkey"
        )
    orders = orders.select_columns(["o_orderkey"])

    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > pa.scalar(pd.Timestamp("1998-01-01"))),
    )

    rev = _revenue_map(li)
    if os.path.getsize(table_path(sf_dir, "orders")) <= distributed_threshold_bytes:
        joined = broadcast_join(
            rev, orders.to_pandas(), left_on="l_orderkey", right_on="o_orderkey", how="inner"
        )
        agg = combiner_aggregate(joined, keys="l_orderkey", aggs={"rev_e4": ("rev_e4", "sum")})
    else:
        agg = hash_bucket_join(
            combiner_aggregate(rev, keys="l_orderkey", aggs={"rev_e4": ("rev_e4", "sum")}),
            orders,
            "l_orderkey",
            "o_orderkey",
        )
    top = topk(agg, "rev_e4", 10, descending=True, tiebreak=["l_orderkey"]).to_pandas()
    top["revenue"] = top["rev_e4"] / 10000.0
    return top[["l_orderkey", "revenue"]]


Q3_SQL = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey
ORDER BY SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) DESC, l.l_orderkey
LIMIT 10
"""


# -- q5: revenue per nation (two broadcast joins, grouped rollup) --------


def q5_nation_revenue(
    sf_dir: str, distributed_threshold_bytes: Optional[int] = None
) -> pd.DataFrame:
    """Revenue per nation, adaptive physical plan.

    Distributed plan (orders past the size threshold -- NO driver-side fact
    materialization): lineitem pre-aggregates to order granularity
    (combiner agg -- the revenue shuffle moves O(orders), not O(lineitem)),
    hash-bucket-joins orders, re-aggregates to customer granularity,
    hash-bucket-joins customer, aggregates to nation keys (25 rows), and
    only then touches the driver for the tiny nation-name merge. Below the
    threshold the orders->nation map is built driver-side and broadcast
    (one pass over lineitem, no shuffle joins)."""
    from xmlschema_ray.ops.relational import hash_bucket_join

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DISTRIBUTED_THRESHOLD_BYTES
    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    rev = _revenue_map(li)
    nation = rd.read_parquet(
        table_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()

    if os.path.getsize(table_path(sf_dir, "orders")) <= distributed_threshold_bytes:
        cust = rd.read_parquet(
            table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        orders_df = rd.read_parquet(
            table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
        ).to_pandas()
        order_nation = orders_df.merge(cust, left_on="o_custkey", right_on="c_custkey")[
            ["o_orderkey", "c_nationkey"]
        ]
        rev_by_nation = combiner_aggregate(
            broadcast_join(
                rev, order_nation, left_on="l_orderkey", right_on="o_orderkey", how="inner"
            ),
            keys="c_nationkey",
            aggs={"rev_e4": ("rev_e4", "sum")},
        ).to_pandas()
    else:
        rev_by_order = combiner_aggregate(
            rev, keys="l_orderkey", aggs={"rev_e4": ("rev_e4", "sum")}
        )
        orders = rd.read_parquet(
            table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
        )
        rev_by_cust = combiner_aggregate(
            hash_bucket_join(rev_by_order, orders, "l_orderkey", "o_orderkey"),
            keys="o_custkey",
            aggs={"rev_e4": ("rev_e4", "sum")},
        )
        cust_ds = rd.read_parquet(
            table_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
        )
        rev_by_nation = combiner_aggregate(
            hash_bucket_join(rev_by_cust, cust_ds, "o_custkey", "c_custkey"),
            keys="c_nationkey",
            aggs={"rev_e4": ("rev_e4", "sum")},
        ).to_pandas()
    df = rev_by_nation.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    df["revenue"] = df["rev_e4"] / 10000.0
    return df[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)


Q5_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# -- large-large partitioned hash join (Ray Dataset.join) ----------------


def join_order_lineitem_status(sf_dir: str) -> pd.DataFrame:
    """Revenue by order status via a hash-partitioned large-large join
    (``Dataset.join``) — the both-sides-large alternative to broadcast."""
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"]
    )
    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    import ray

    # Dataset.join spins up num_partitions hash-shuffle AGGREGATOR actors
    # that coexist with the read/map tasks: sizing them at 2x CPUs
    # oversubscribes the node and serializes the join (measured 33 s vs
    # 3.4 s at 32 CPUs). ~CPUs/2 aggregators, floored by the per-partition
    # byte target, keeps the pool and the upstream pipeline co-resident.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(
        max(8, cpus // 2),
        -(-os.path.getsize(table_path(sf_dir, "lineitem")) // (256 << 20)),
    )

    li2 = _revenue_map(li)
    joined = li2.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = combiner_aggregate(
        joined, keys="o_orderstatus", aggs={"rev_e4": ("rev_e4", "sum"), "n_lines": (None, "count")}
    )
    df = agg.to_pandas()
    df["revenue"] = df["rev_e4"] / 10000.0
    df["n_lines"] = df["n_lines"].astype("int64")
    return df[["o_orderstatus", "revenue", "n_lines"]].sort_values("o_orderstatus").reset_index(drop=True)


def urgent_revenue_bloom_join(sf_dir: str, m_bits: int = 1 << 22) -> pd.DataFrame:
    """Per-order revenue of URGENT orders via a BLOOM-PRUNED large-large
    join (``ops.bloom_prune_join``) — the selective-build-side join plan:
    the urgent-order key set broadcasts as a fixed Bloom bit array, probe
    lineitems that cannot match never enter the shuffle (~priority-share
    of the fact table + FPR instead of 100 %), and Bloom false positives
    die in the exact per-partition merge, so the result equals the
    unpruned join bit-for-bit (forced ~100 %-fill test). Revenue stays in
    scaled integers until one final division."""
    from xmlschema_ray.ops.relational import bloom_prune_join

    urgent = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == pc.scalar("1-URGENT")),
    ).select_columns(["o_orderkey"])
    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = bloom_prune_join(_revenue_map(li), urgent, "l_orderkey", "o_orderkey", m_bits=m_bits)
    agg = combiner_aggregate(
        joined,
        keys="l_orderkey",
        aggs={"rev_e4": ("rev_e4", "sum"), "n_lines": (None, "count")},
    )
    df = agg.to_pandas()
    df["revenue"] = df["rev_e4"] / 10000.0
    df["n_lines"] = df["n_lines"].astype("int64")
    df["o_orderkey"] = df["l_orderkey"].astype("int64")
    return (
        df[["o_orderkey", "revenue", "n_lines"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


URGENT_BLOOM_SQL = """
SELECT o.o_orderkey,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


def brand_revenue_skew_join(
    sf_dir: str, hot_threshold: int = 25, local_topn: int = 512
) -> pd.DataFrame:
    """Revenue by part brand through the SKEW-SPLIT join
    (``ops.skew_split_join``): probe keys the plan pass observes at ≥
    ``hot_threshold`` lineitems join map-side against a broadcast of their
    part rows and never enter the exchange; the cold remainder takes the
    regular bucketed join. The hot/cold split partitions the probe rows,
    so the aggregate is bit-identical for ANY hot set (forced-path tests
    in test_ops) — which is what lets an APPROXIMATE plan pass drive an
    EXACT join. At these scale factors l_partkey averages ~30 lines/part,
    so the threshold genuinely routes a mixed population. Revenue stays in
    scaled integers until one final division."""
    from xmlschema_ray.ops.relational import skew_split_join

    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    part = rd.read_parquet(table_path(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    joined = skew_split_join(
        _revenue_map(li, key="l_partkey"),
        part,
        "l_partkey",
        "p_partkey",
        hot_threshold=hot_threshold,
        local_topn=local_topn,
    )
    agg = combiner_aggregate(
        joined, keys="p_brand", aggs={"rev_e4": ("rev_e4", "sum"), "n_lines": (None, "count")}
    )
    df = agg.to_pandas()
    df["revenue"] = df["rev_e4"] / 10000.0
    df["n_lines"] = df["n_lines"].astype("int64")
    return (
        df[["p_brand", "revenue", "n_lines"]]
        .sort_values("p_brand")
        .reset_index(drop=True)
    )


BRAND_REVENUE_SKEW_SQL = """
SELECT p.p_brand,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


def clustered_price_band(
    sf_dir: str, lo_c: int = 5_000_000, hi_c: int = 15_000_000
) -> pd.DataFrame:
    """Range query over a RANGE-CLUSTERED layout (``sources.clustered``):
    orders are exported once, globally sorted on price cents with a
    zone-map manifest assembled from the parquet footers' own min/max
    statistics; the band read then opens ONLY the overlapping files
    (file-level pruning — at a 100-TB table the difference between
    touching 3 files and 30,000) and the exact residual filter makes the
    result correct for ANY layout (pruned ≡ full+filter, pinned in
    tests/test_clustered.py). The layout is cached per scale factor —
    clustering is paid once, every later band read prunes."""
    import os

    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.sources.clustered import MANIFEST_NAME, read_clustered, write_clustered

    cache = os.path.join(
        "/tmp/xmlschema_ray_clustered", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(cache, MANIFEST_NAME)):
        orders = rd.read_parquet(
            table_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )

        def to_c(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "o_orderkey": batch["o_orderkey"].astype("int64"),
                    "o_orderstatus": batch["o_orderstatus"],
                    "price_c": cents(batch["o_totalprice"]),
                }
            )

        # build into a tmp dir, publish by atomic rename (a concurrent
        # builder loses the rename and reuses the winner's layout)
        tmp = f"{cache}.build{os.getpid()}"
        # a crashed same-pid build leaves stale parquet the layout
        # writers now refuse — clear it before building
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
        write_clustered(orders.map_batches(to_c, batch_format="pandas"), "price_c", tmp)
        try:
            os.rename(tmp, cache)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    band = read_clustered(cache, lo=lo_c, hi=hi_c, columns=["o_orderstatus", "price_c"])
    df = combiner_aggregate(
        band, keys="o_orderstatus", aggs={"n": (None, "count"), "total_c": ("price_c", "sum")}
    ).to_pandas()
    df["n"] = df["n"].astype("int64")
    df["total_c"] = df["total_c"].astype("int64")
    return df.sort_values("o_orderstatus").reset_index(drop=True)


def zordered_box_query(
    sf_dir: str,
    pk_lo: int = 100,
    pk_hi: int = 400,
    sk_lo: int = 10,
    sk_hi: int = 60,
) -> pd.DataFrame:
    """2-D box query over a Z-ORDER-CLUSTERED layout
    (``sources.zordered``): lineitem is exported once, globally sorted on
    the Morton interleave of (l_partkey, l_suppkey) with a per-file
    bounding-RECTANGLE manifest from the parquet footers' own statistics;
    the box read then opens only the rectangle-intersecting files —
    file-level pruning on EITHER dimension or both, where the 1-D range
    layout (``clustered_price_band``) serves only its sort key. The exact
    residual filter makes the result correct for ANY layout (pruned ≡
    full+filter, pinned in tests/test_zordered.py, which also pins that a
    box tight in the SECOND dimension alone still prunes — the property a
    plain sort cannot give). Layout cached per scale factor; clustering
    is paid once, every later box read prunes. Returnflag breakdown of
    the box in exact integer cents."""
    import os

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.sources.zordered import ZMANIFEST_NAME, read_zordered, write_zordered

    cache = os.path.join(
        "/tmp/xmlschema_ray_zorder", os.path.basename(os.path.normpath(sf_dir))
    )
    if not os.path.exists(os.path.join(cache, ZMANIFEST_NAME)):
        li = rd.read_parquet(
            table_path(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_returnflag", "l_quantity"],
        )

        def to_c(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "l_partkey": batch["l_partkey"].astype("int64"),
                    "l_suppkey": batch["l_suppkey"].astype("int64"),
                    "l_returnflag": batch["l_returnflag"],
                    "qty_c": cents(batch["l_quantity"]),
                }
            )

        tmp = f"{cache}.build{os.getpid()}"

        # a crashed same-pid build leaves stale parquet the layout

        # writers now refuse — clear it before building

        import shutil as _sh


        _sh.rmtree(tmp, ignore_errors=True)
        write_zordered(
            li.map_batches(to_c, batch_format="pandas"), "l_partkey", "l_suppkey", tmp
        )
        try:
            os.rename(tmp, cache)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    box = read_zordered(
        cache,
        x_lo=pk_lo,
        x_hi=pk_hi,
        y_lo=sk_lo,
        y_hi=sk_hi,
        columns=["l_returnflag", "qty_c"],
    )
    df = to_pandas_with_schema(
        combiner_aggregate(
            box, keys="l_returnflag", aggs={"n": (None, "count"), "qty_c": ("qty_c", "sum")}
        )
    )
    if len(df) == 0:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "qty_c": pd.Series([], dtype="int64"),
            }
        )
    df["n"] = df["n"].astype("int64")
    df["qty_c"] = df["qty_c"].astype("int64")
    return df.sort_values("l_returnflag").reset_index(drop=True)


ZORDERED_BOX_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 60
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def _merge_rev_partial(la: pd.DataFrame, lb: pd.DataFrame) -> pd.DataFrame:
    """Per-range partial for the clustered merge join: local inner join +
    per-status (count, revenue) fold, so joined rows never leave the task."""
    if len(la) == 0 or len(lb) == 0:
        return pd.DataFrame(
            {
                "o_orderstatus": pd.Series([], dtype=object),
                "n_items": pd.Series([], dtype=np.int64),
                "revenue_c": pd.Series([], dtype=np.int64),
            }
        )
    m = lb.merge(la, left_on="l_orderkey", right_on="o_orderkey")
    return m.groupby("o_orderstatus", as_index=False).agg(
        n_items=("price_c", "size"), revenue_c=("price_c", "sum")
    )


def clustered_merge_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue per order status through a ZERO-EXCHANGE sort-merge join of
    two RANGE-CLUSTERED layouts (``sources.clustered.clustered_merge_join``):
    orders and lineitem are each exported once globally sorted on the
    order key with zone-map manifests, then the join is pure zone
    alignment — disjoint key ranges at the union of both manifests' file
    boundaries, one task per range reading only its overlapping files
    from each side and folding per-status partials in place. The
    range-layout counterpart of ``bucketed_join_revenue`` (hash layout →
    exchange-free equi-join; sorted layout → exchange-free MERGE join,
    and the same layout also serves range scans). Layouts cached per SF;
    the sort is paid once, every later join is exchange-free."""
    import os

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.sources.clustered import (
        MANIFEST_NAME,
        clustered_merge_join,
        write_clustered,
    )

    base = "/tmp/xmlschema_ray_mergejoin"
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    dir_o = os.path.join(base, sf_name, "orders")
    dir_l = os.path.join(base, sf_name, "lineitem")

    def build(table: str, key: str, proj, out_dir: str) -> None:
        if os.path.exists(os.path.join(out_dir, MANIFEST_NAME)):
            return
        ds = rd.read_parquet(table_path(sf_dir, table))
        tmp = f"{out_dir}.build{os.getpid()}"
        # a crashed same-pid build leaves stale parquet the layout
        # writers now refuse — clear it before building
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
        write_clustered(ds.map_batches(proj, batch_format="pandas"), key, tmp)
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        try:
            os.rename(tmp, out_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    def o_proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_orderstatus": b["o_orderstatus"],
            }
        )

    def l_proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "price_c": cents(b["l_extendedprice"]),
            }
        )

    build("orders", "o_orderkey", o_proj, dir_o)
    build("lineitem", "l_orderkey", l_proj, dir_l)

    partials = clustered_merge_join(
        dir_o,
        dir_l,
        _merge_rev_partial,
        columns_a=["o_orderkey", "o_orderstatus"],
        columns_b=["l_orderkey", "price_c"],
    )
    df = to_pandas_with_schema(
        combiner_aggregate(
            partials,
            "o_orderstatus",
            {"n_items": ("n_items", "sum"), "revenue_c": ("revenue_c", "sum")},
        )
    )
    if len(df) == 0:
        return pd.DataFrame(
            {
                "o_orderstatus": pd.Series([], dtype=object),
                "n_items": pd.Series([], dtype=np.int64),
                "revenue_c": pd.Series([], dtype=np.int64),
            }
        )
    df["n_items"] = df["n_items"].astype("int64")
    df["revenue_c"] = df["revenue_c"].astype("int64")
    return df.sort_values("o_orderstatus").reset_index(drop=True)


CLUSTERED_MERGE_REVENUE_SQL = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


def bloom_index_custkey_lookup(sf_dir: str, modulus: int = 1009) -> pd.DataFrame:
    """Membership lookup through a BLOOM FILE-SKIPPING INDEX
    (``sources.bloomindex``): orders cached as a multi-file layout in
    natural order (clustered by NOTHING — the case the other two layouts
    can't serve), a per-file Bloom index built on ``o_custkey`` in one
    file-parallel column-projected pass, then an IN-list probe (customer
    keys ≡ 0 mod ``modulus``) opens only the files whose filter claims a
    probe key and the exact ``isin`` residual makes the result correct at
    ANY false-positive load (no false negatives by construction — pinned
    in tests/test_bloomindex.py). At a 100k-file corpus this is the
    difference between a metadata probe + a handful of reads and a full
    scan for every ad-hoc IN-list on a non-layout column. Per-custkey
    order counts + cents totals; layout and index cached per scale
    factor."""
    import shutil

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.sources.bloomindex import (
        BLOOM_MANIFEST,
        HASH_TAG as BLOOM_HASH_TAG,
        build_bloom_index,
        read_with_bloom,
    )

    root = os.path.join(
        "/tmp/xmlschema_ray_bloomidx", os.path.basename(os.path.normpath(sf_dir))
    )
    data, idx = os.path.join(root, "orders16"), os.path.join(root, "orders16_idx")
    # layout_cache_fresh wipes a stale-hash-tag index so the rebuild's
    # os.rename lands (a stale idx dir would make the rename fail and the
    # stale index would keep being probed — the exact false-negative class
    # the v2 tag exists to prevent)
    if not layout_cache_fresh(idx, BLOOM_MANIFEST, BLOOM_HASH_TAG):
        os.makedirs(root, exist_ok=True)

        # the packed DATA corpus rebuilds only when it is genuinely
        # missing: a stale-INDEX heal (the post-hash-upgrade case) keeps
        # the data and rebuilds just the sidecar — rewriting the whole
        # corpus into a tmp dir whose rename then fails on the existing
        # data dir would be pure wasted I/O on every heal
        if not os.path.isdir(data) or not any(
            f.endswith(".parquet") for f in os.listdir(data)
        ):

            def to_c(batch: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "o_custkey": batch["o_custkey"].astype("int64"),
                        "price_c": cents(batch["o_totalprice"]),
                    }
                )

            tmp = f"{data}.build{os.getpid()}"
            # a crashed same-pid build leaves stale parquet — clear first
            shutil.rmtree(tmp, ignore_errors=True)
            rd.read_parquet(
                table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
            ).map_batches(to_c, batch_format="pandas").repartition(16).write_parquet(tmp)
            try:
                os.rename(tmp, data)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        tmp = f"{idx}.build{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_bloom_index(data, "o_custkey", tmp)
        try:
            os.rename(tmp, idx)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    cust = rd.read_parquet(table_path(sf_dir, "customer"), columns=["c_custkey"])

    def mod_filter(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({"c_custkey": k[k % modulus == 0]})

    probe = np.sort(
        cust.map_batches(mod_filter, batch_format="pandas").to_pandas()["c_custkey"].to_numpy(np.int64)
    )
    hits = read_with_bloom(data, idx, probe)
    df = to_pandas_with_schema(
        combiner_aggregate(
            hits, "o_custkey", {"n_orders": (None, "count"), "total_c": ("price_c", "sum")}
        )
    )
    if not len(df):
        return pd.DataFrame(
            {
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "total_c": pd.Series([], dtype=np.int64),
            }
        )
    df["n_orders"] = df["n_orders"].astype("int64")
    df["total_c"] = df["total_c"].astype("int64")
    return df.sort_values("o_custkey").reset_index(drop=True)


BLOOM_INDEX_CUSTKEY_SQL = """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 1009 = 0)
GROUP BY o_custkey
ORDER BY o_custkey
"""


def bucketed_join_revenue(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Join over a HASH-BUCKETED layout (``sources.bucketed``): orders and
    lineitem are exported ONCE co-partitioned on orderkey (one exchange
    each, paid at write time); the join itself is then ZERO-exchange —
    one task per bucket reads that bucket's files from both sides and
    joins locally, with the per-priority revenue partials computed
    in-task so joined rows never materialize. The recurring-join answer
    to the shuffle-minimization rule: at 100 TB the nightly
    orders⋈lineitem stops being an all-to-all. Layout compatibility
    (same hash fn + bucket count) is enforced by the manifests — an
    incompatible pair REFUSES instead of silently dropping matches
    (tests/test_bucketed.py pins both)."""
    import os

    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.sources.bucketed import (
        BUCKET_MANIFEST,
        HASH_TAG as BUCKET_HASH_TAG,
        bucketed_join,
        write_bucketed,
    )

    root = os.path.join(
        "/tmp/xmlschema_ray_bucketed", os.path.basename(os.path.normpath(sf_dir))
    )

    def ensure(table: str, key: str, cols, prep=None) -> str:
        cache = os.path.join(root, table)
        # self-heal a warm /tmp cache written under an older bucket hash
        # (read_manifest would refuse it with ValueError otherwise)
        if not layout_cache_fresh(cache, BUCKET_MANIFEST, BUCKET_HASH_TAG):
            ds = rd.read_parquet(table_path(sf_dir, table), columns=cols)
            if prep is not None:
                ds = ds.map_batches(prep, batch_format="pandas")
            tmp = f"{cache}.build{os.getpid()}"
            # a crashed same-pid build leaves stale parquet the layout
            # writers now refuse — clear it before building
            import shutil as _sh

            _sh.rmtree(tmp, ignore_errors=True)
            write_bucketed(ds, key, tmp, num_buckets)
            try:
                os.rename(tmp, cache)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        return cache

    def line_prep(batch: pd.DataFrame) -> pd.DataFrame:
        # revenue in scaled ints at WRITE time: cents(price) * (100 - cents-of-discount)
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].astype("int64"),
                "rev_c": cents(batch["l_extendedprice"]) * (100 - cents(batch["l_discount"])),
            }
        )

    odir = ensure("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"])
    ldir = ensure(
        "lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"], line_prep
    )

    def per_bucket(j: pd.DataFrame) -> pd.DataFrame:
        g = j.groupby("o_orderpriority", sort=False)["rev_c"]
        out = pd.DataFrame({"rev_c": g.sum(), "n_lines": g.size()}).reset_index()
        out["rev_c"] = out["rev_c"].astype("int64")
        out["n_lines"] = out["n_lines"].astype("int64")
        return out

    parts = bucketed_join(odir, ldir, fn=per_bucket)
    df = combiner_aggregate(
        parts,
        keys="o_orderpriority",
        aggs={"rev_c": ("rev_c", "sum"), "n_lines": ("n_lines", "sum")},
    ).to_pandas()
    df["revenue"] = df["rev_c"].astype("int64") / 10000.0
    df["n_lines"] = df["n_lines"].astype("int64")
    return (
        df.sort_values("o_orderpriority")
        .reset_index(drop=True)[["o_orderpriority", "revenue", "n_lines"]]
    )


BUCKETED_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


CLUSTERED_BAND_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS total_c
FROM (SELECT o_orderstatus, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders)
WHERE c BETWEEN 5000000 AND 15000000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


JOIN_STATUS_SQL = """
SELECT o.o_orderstatus,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


# -- top-k / filter+project / distinct / duplicate detection -------------


def top10_customers_by_totalprice(sf_dir: str) -> pd.DataFrame:
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch["price_c"] = cents(batch["o_totalprice"])
        return batch[["o_orderkey", "o_custkey", "price_c"]]

    t = topk(
        orders.map_batches(to_cents, batch_format="pandas"),
        "price_c",
        10,
        descending=True,
        tiebreak=["o_orderkey"],
    ).to_pandas()
    t["o_totalprice"] = t["price_c"] / 100.0
    return t[["o_orderkey", "o_custkey", "o_totalprice"]]


TOP10_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS o_totalprice
FROM orders
ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey
LIMIT 10
"""


def filter_project_lineitem(sf_dir: str) -> "rd.Dataset":
    """Predicate + projection pushed to the parquet read (prune-at-read:
    only 4 columns leave storage, row groups filtered)."""
    return rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        filter=(
            (pc.field("l_quantity") >= pc.scalar(48.0))
        ),
    ).filter(expr="l_extendedprice > 90000.0")


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity >= 48 AND l_extendedprice > 90000.0
"""


def distinct_part_count(sf_dir: str) -> pd.DataFrame:
    """Exact distributed distinct: per-batch dedup partials → hash-partition
    → per-partition distinct counts → driver sum of #partitions ints. No
    driver-side materialization of the value set (``ds.unique`` would ship
    every distinct value to the driver); the approximate alternative for
    quick profiling is the HLL sketch in the stats channel."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_partkey"])

    def batch_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    def count_partition(part: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": pd.array([part["l_partkey"].nunique()], dtype="int64")})

    partials = ds.map_batches(batch_distinct, batch_format="pandas")
    counts = hash_partition_apply(partials, "l_partkey", count_partition)
    n = int(counts.to_pandas()["n"].sum())
    return pd.DataFrame({"n_distinct_parts": pd.array([n], dtype="int64")})


DISTINCT_SQL = "SELECT COUNT(DISTINCT l_partkey) AS n_distinct_parts FROM lineitem"


def duplicate_orderkeys(sf_dir: str) -> pd.DataFrame:
    """Key-multiplicity detection — the xs:unique groupby-count shape
    (``validators/identities.py:198-221``) as a standalone operator."""
    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_orderkey"])
    agg = combiner_aggregate(ds, keys="l_orderkey", aggs={"n_lines": (None, "count")})
    dups = agg.filter(expr="n_lines > 1").to_pandas()
    dups["n_lines"] = dups["n_lines"].astype("int64")
    return dups.sort_values("l_orderkey").reset_index(drop=True)


DUP_ORDERKEYS_SQL = """
SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
GROUP BY l_orderkey HAVING COUNT(*) > 1 ORDER BY l_orderkey
"""


def top2_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Per-key ranked selection: each customer's 2 highest-value orders.
    Hash-partition by customer, then ONE vectorized sort + groupby-head
    per partition (not per key) — the per-group top-N pattern without
    per-group Python."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["price_c"] = cents(batch["o_totalprice"])
        return batch[["o_orderkey", "o_custkey", "price_c"]]

    def head2(part: pd.DataFrame) -> pd.DataFrame:
        p2 = part.sort_values(
            ["o_custkey", "price_c", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return p2.groupby("o_custkey", sort=False).head(2)

    out = hash_partition_apply(
        ds.map_batches(to_cents, batch_format="pandas"), "o_custkey", head2
    ).to_pandas()
    out["o_totalprice"] = out["price_c"] / 100.0
    return (
        out[["o_custkey", "o_orderkey", "o_totalprice"]]
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )


TOP2_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey
  ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey
) <= 2
ORDER BY o_custkey, o_orderkey
"""



# -- events: windows, sessions, JSON -------------------------------------


def events_daily_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling daily window per user (streaming-shaped workload expressed
    as grouped aggregation — SURVEY §2.11: no watermarks needed for batch
    logs; ordering assumption is none, the window key is derived per row)."""
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "day": batch["ts"].dt.floor("D"),
                "value_c": cents(batch["value"]),
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(add_window, batch_format="pandas"),
        keys=["user_id", "day"],
        aggs={"n_events": (None, "count"), "sum_value_c": ("value_c", "sum")},
    )
    df = agg.to_pandas()
    df["sum_value"] = df["sum_value_c"] / 100.0
    df["n_events"] = df["n_events"].astype("int64")
    df["day"] = df["day"].astype("datetime64[us]")  # match DuckDB's unit
    return df[["user_id", "day", "n_events", "sum_value"]].sort_values(["user_id", "day"]).reset_index(drop=True)


DAILY_WINDOW_SQL = """
SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY user_id, date_trunc('day', ts) ORDER BY user_id, day
"""


def events_sliding_window(sf_dir: str, window_days: int = 3) -> pd.DataFrame:
    """Sliding window: per (user, window_end_day), events/value over the
    trailing ``window_days`` days. Expressed batch-natively: each event
    EXPLODES to the ``window_days`` window keys it belongs to (flat-map
    inside ``map_batches``), then the usual combiner aggregate — no
    watermark machinery needed for a batch log (SURVEY §2.11)."""
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        day = batch["ts"].dt.floor("D")
        frames = []
        for o in range(window_days):
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": batch["user_id"],
                        "window_end": day + pd.Timedelta(days=o),
                        "value_c": cents(batch["value"]),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    agg = combiner_aggregate(
        ds.map_batches(explode, batch_format="pandas"),
        keys=["user_id", "window_end"],
        aggs={"n_events": (None, "count"), "sum_value_c": ("value_c", "sum")},
    ).to_pandas()
    agg["sum_value"] = agg["sum_value_c"] / 100.0
    agg["n_events"] = agg["n_events"].astype("int64")
    agg["window_end"] = agg["window_end"].astype("datetime64[us]")
    return (
        agg[["user_id", "window_end", "n_events", "sum_value"]]
        .sort_values(["user_id", "window_end"])
        .reset_index(drop=True)
    )


SLIDING_WINDOW_SQL = """
SELECT user_id,
       date_trunc('day', ts) + to_days(o) AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events, (VALUES (0), (1), (2)) AS offs(o)
GROUP BY user_id, date_trunc('day', ts) + to_days(o)
ORDER BY user_id, window_end
"""


def weekly_active_users(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Rolling COUNT DISTINCT: active users over the trailing
    ``window_days`` days per window-end day (the DAU/WAU engagement
    metric). Distinct counting is holistic, so the shape differs from
    the additive sliding window above: each event explodes to its
    ``window_days`` window keys and the per-batch partial COMPRESSES to
    distinct (window_end, user_id, count) triples — repeats within a
    batch ship once. One window-keyed exchange co-locates every holder
    of a window, where ``nunique`` is exact regardless of how many
    batches re-emitted a pair; event totals stay additive partials.
    Window cardinality ≈ days, so the result is metadata-sized."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # compress FIRST (distinct (day, user) counts), THEN explode: the
        # window_days× blowup applies to distinct pairs, not raw events
        day_user = (
            pd.DataFrame(
                {"user_id": batch["user_id"], "day": batch["ts"].dt.floor("D")}
            )
            .groupby(["day", "user_id"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        frames = [
            pd.DataFrame(
                {
                    "window_end": day_user["day"] + pd.Timedelta(days=o),
                    "user_id": day_user["user_id"],
                    "n": day_user["n"],
                }
            )
            for o in range(window_days)
        ]
        return pd.concat(frames, ignore_index=True)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("window_end", sort=False).agg(
            n_active_users=("user_id", "nunique"), n_events=("n", "sum")
        )
        return agg.reset_index()

    out = hash_partition_apply(
        ds.map_batches(explode, batch_format="pandas"), "window_end", per_part
    ).to_pandas()
    out["window_end"] = out["window_end"].astype("datetime64[us]")
    out["n_active_users"] = out["n_active_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("window_end").reset_index(drop=True)


WEEKLY_ACTIVE_SQL = """
SELECT date_trunc('day', ts) + to_days(o) AS window_end,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, (VALUES (0), (1), (2), (3), (4), (5), (6)) AS offs(o)
GROUP BY 1
ORDER BY 1
"""


def sessionize_events(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization per user: ``groupby(user).map_groups`` over
    ts-sorted groups. Partitioning assumption (SURVEY §2.11): one user's
    events fit a worker and are sorted INSIDE the group — cross-partition
    session splits are impossible because the groupby co-locates each
    user."""
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(part: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the whole hash partition: sort by (user, ts),
        # a session break is a gap > threshold within the same user
        p = part.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = p["user_id"].ne(p["user_id"].shift())
        breaks = (p["ts"].diff() > gap) & ~new_user
        out = (
            pd.DataFrame({"user_id": p["user_id"], "brk": breaks})
            .groupby("user_id", sort=False)["brk"]
            .sum()
        )
        return pd.DataFrame(
            {"user_id": out.index, "n_sessions": pd.array(out.values + 1, dtype="int64")}
        )

    from xmlschema_ray.ops.relational import hash_partition_apply

    out = hash_partition_apply(ds, "user_id", sessions).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def debounce_events(sf_dir: str, gap_minutes: int = 1440) -> "rd.Dataset":
    """Event-stream DEBOUNCE (bounce / duplicate-fire suppression): within
    each (user_id, event_type) stream, a burst is a maximal chain of
    events each arriving less than ``gap`` after its predecessor; only the
    burst LEADER survives — the streaming dedup every clickstream /
    telemetry ingest runs before counting anything. The keep decision is
    the lag-gap predicate, so it needs only each event's immediate
    predecessor, not the whole burst.

    Partitioning (SURVEY §2.11): ONE hash exchange co-locates each
    (user, type) stream whole; the leader scan inside the partition is a
    single vectorized sort + shift compare. Tie order is fixed by
    (ts, event_id) so both engines resolve equal timestamps identically.
    Returns the kept event_ids as a canonically sorted Dataset.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def leaders(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        new_key = p["user_id"].ne(p["user_id"].shift()) | p["event_type"].ne(
            p["event_type"].shift()
        )
        keep = new_key | (p["ts"].diff() >= gap)
        return p.loc[keep, ["event_id"]].reset_index(drop=True)

    kept = hash_partition_apply(ds, ["user_id", "event_type"], leaders)
    return kept.sort("event_id")


def funnel_conversion(
    sf_dir: str, steps: tuple = ("view", "click", "purchase")
) -> pd.DataFrame:
    """Ordered multi-step FUNNEL over per-user event streams — how many
    users performed step 1, then step 2 strictly after their first step 1,
    then step 3 strictly after that (first-touch chaining), plus the total
    step-to-step latency. The conversion analysis every product/event
    pipeline runs; sequentially dependent (step i's timestamps depend on
    step i-1's per-user anchor), so it is NOT a plain groupby.

    Partitioning (SURVEY §2.11): rows are pre-filtered to funnel-step
    types at the scan, then ONE hash exchange co-locates each user's
    events; inside a partition the chain is |steps| vectorized
    groupby-mins + map-aligned strict-after filters (no per-user Python).
    Each partition emits |steps| partial rows (n_users, sum_lag_us —
    integer microseconds so the merge and the oracle compare exactly);
    the driver folds partials with one tiny groupby. Anchors are per-user
    FIRST occurrences, making the result independent of partition count.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["user_id", "event_type", "ts"]
    )
    step_list = list(steps)

    def only_steps(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["event_type"], value_set=pa.array(step_list)))

    def funnel_part(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        prev = None  # user_id -> anchor ts of the previous step
        for i, st in enumerate(step_list, 1):
            sub = part[part["event_type"] == st]
            if prev is None:
                t = sub.groupby("user_id")["ts"].min()
                lag = 0
            else:
                tp = sub["user_id"].map(prev)
                sub = sub[(sub["ts"] > tp).to_numpy()]  # NaT-anchor compares False
                t = sub.groupby("user_id")["ts"].min()
                aligned = prev.reindex(t.index)
                lag = (
                    int(
                        (t.to_numpy() - aligned.to_numpy())
                        .astype("timedelta64[us]")
                        .astype(np.int64)
                        .sum()
                    )
                    if len(t)
                    else 0
                )
            rows.append(
                {"step": i, "event_type": st, "n_users": len(t), "sum_lag_us": lag}
            )
            prev = t
        return pd.DataFrame(rows).astype(
            {"step": "int64", "n_users": "int64", "sum_lag_us": "int64"}
        )

    parts = hash_partition_apply(
        ds.map_batches(only_steps, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        funnel_part,
    )
    df = to_pandas_with_schema(parts)
    out = (
        df.groupby(["step", "event_type"], as_index=False)[["n_users", "sum_lag_us"]]
        .sum()
        .astype({"step": "int64", "n_users": "int64", "sum_lag_us": "int64"})
    )
    return out.sort_values("step").reset_index(drop=True)


def _within_group_pair_indices(
    group_keys: np.ndarray, max_group: int = 4096
) -> "tuple[np.ndarray, np.ndarray]":
    """All ordered index pairs (i < j) WITHIN runs of equal ``group_keys``
    (must be pre-sorted so each group is contiguous), as pure repeat/cumsum
    integer arithmetic — a group of s rows yields s(s-1)/2 pairs with no
    Python loop. Raises past ``max_group`` (quadratic blowup guard).
    Shared by the co-occurrence miner and the triangle counter's wedge
    generation."""
    n = len(group_keys)
    if n == 0:
        empty = np.array([], dtype=np.int64)
        return empty, empty
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    np.not_equal(group_keys[1:], group_keys[:-1], out=new_grp[1:])
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    r = np.arange(n) - grp_start  # within-group position
    if int(r.max()) + 1 > max_group:
        raise ValueError(
            f"group of {int(r.max()) + 1} rows exceeds max_group={max_group}; "
            "use the minhash dedup family for groups this wide"
        )
    total = int(r.sum())
    # element g (within-pos r) is the larger member of r pairs, paired with
    # the r elements before it in its group
    j_idx = np.repeat(np.arange(n), r)
    block_start = np.cumsum(r) - r
    i_idx = np.arange(total) - np.repeat(block_start, r) + np.repeat(grp_start, r)
    return i_idx, j_idx


def part_pair_cooccurrence(
    sf_dir: str, min_support: int = 2, max_basket: int = 4096
) -> "rd.Dataset":
    """Market-basket CO-OCCURRENCE mining: unordered part pairs that appear
    together in at least ``min_support`` distinct orders — the frequent-
    itemset / association-rule primitive (and the bipartite-graph
    projection orders→part-part edges).

    The self-join never materializes order-wide: ONE hash exchange
    co-locates each order's (distinct) parts, within-partition pair
    generation is pure integer index arithmetic (repeat/cumsum — each
    order of s parts yields s(s-1)/2 pairs with no Python loop), and the
    pair stream collapses through a combiner count exchange keyed on the
    pair, so a pair crossing many partitions ships partial-count rows,
    never raw pairs. Basket-size blowup is the known hazard (a 10^4-item
    basket alone is 5·10^7 pairs): baskets over ``max_basket`` raise
    rather than silently OOM — at that size the right tool is the minhash
    family, not exact pairs."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.drop_duplicates().sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        pk = p["l_partkey"].to_numpy(np.int64)
        i_idx, j_idx = _within_group_pair_indices(
            p["l_orderkey"].to_numpy(np.int64), max_group=max_basket
        )
        if len(i_idx) == 0:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype=np.int64),
                    "part_b": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        out = pd.DataFrame({"part_a": pk[i_idx], "part_b": pk[j_idx]})
        return out.groupby(["part_a", "part_b"], as_index=False).size().rename(columns={"size": "n"})

    partials = hash_partition_apply(ds, "l_orderkey", pairs_part)
    counts = combiner_aggregate(partials, ["part_a", "part_b"], {"n_orders": ("n", "sum")})

    def support_filter(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["n_orders"], pa.scalar(min_support)))
        return t.set_column(
            t.schema.get_field_index("n_orders"), "n_orders", pc.cast(t["n_orders"], pa.int64())
        )

    return counts.map_batches(support_filter, batch_format="pyarrow").sort(
        ["part_a", "part_b"]
    )


def fd_discovery(sf_dir: str) -> pd.DataFrame:
    """FUNCTIONAL-DEPENDENCY discovery: for each candidate ``LHS → RHS``,
    does one LHS value ever map to more than one RHS value — the schema
    profiling step that FEEDS ``fd_repair_by_source`` (repair assumes the
    FD; discovery finds which hold and how badly the others are broken,
    the TANE/metanome shape restricted to declared candidates, which is
    how production profilers run it at fact scale).

    Per candidate, two bounded exchanges over key-cardinality data and
    ZERO fact-sized driver state: per-batch dedupe of the (lhs, rhs)
    projection → a pair-combiner (distinct pairs), → an lhs-combiner
    (RHS fan-out per LHS); the report row folds three distributed counts.
    ``holds`` is exact (1 iff no LHS maps to 2+ RHS), ``n_violating_lhs``
    counts the offenders — the repair worklist size."""
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_partition_apply

    candidates = [
        ("lineitem", "l_orderkey", "l_returnflag"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("orders", "o_orderkey", "o_orderstatus"),
    ]
    rows = []
    for table, lhs, rhs in candidates:
        ds = rd.read_parquet(table_path(sf_dir, table), columns=[lhs, rhs])

        def dedupe(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.drop_duplicates()

        pairs = combiner_aggregate(
            ds.map_batches(dedupe, batch_format="pandas"),
            [lhs, rhs],
            {"c": (None, "count")},
        )
        n_pairs = int(pairs.count())
        fanout = combiner_aggregate(pairs, lhs, {"k": (None, "count")})
        n_lhs = int(fanout.count())

        def viol(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": [int((batch["k"].to_numpy() > 1).sum())]})

        n_viol = int(
            fanout.map_batches(viol, batch_format="pandas").sum("v") or 0
        )
        rows.append(
            (
                f"{table}.{lhs}->{rhs}",
                n_lhs,
                n_pairs,
                n_viol,
                int(n_viol == 0),
            )
        )
    return (
        pd.DataFrame(
            rows, columns=["fd", "n_lhs", "n_pairs", "n_violating_lhs", "holds"]
        )
        .astype({"n_lhs": "int64", "n_pairs": "int64", "n_violating_lhs": "int64", "holds": "int64"})
        .sort_values("fd")
        .reset_index(drop=True)
    )


FD_DISCOVERY_SQL = """
WITH p1 AS (
  SELECT 'lineitem.l_orderkey->l_returnflag' AS fd,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_lhs,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem)
), v1 AS (
  SELECT CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
  FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS nr FROM lineitem GROUP BY 1)
), p2 AS (
  SELECT 'lineitem.l_partkey->l_suppkey' AS fd,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_lhs,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
), v2 AS (
  SELECT CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
  FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nr FROM lineitem GROUP BY 1)
), p3 AS (
  SELECT 'orders.o_custkey->o_orderpriority' AS fd,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_lhs,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
), v3 AS (
  SELECT CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nr FROM orders GROUP BY 1)
), p4 AS (
  SELECT 'orders.o_orderkey->o_orderstatus' AS fd,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_lhs,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM (SELECT DISTINCT o_orderkey, o_orderstatus FROM orders)
), v4 AS (
  SELECT CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_orderstatus) AS nr FROM orders GROUP BY 1)
)
SELECT fd, n_lhs, n_pairs, n_viol AS n_violating_lhs,
       CAST(CASE WHEN n_viol = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM (
  SELECT p1.fd, p1.n_lhs, p1.n_pairs, v1.n_viol FROM p1, v1
  UNION ALL SELECT p2.fd, p2.n_lhs, p2.n_pairs, v2.n_viol FROM p2, v2
  UNION ALL SELECT p3.fd, p3.n_lhs, p3.n_pairs, v3.n_viol FROM p3, v3
  UNION ALL SELECT p4.fd, p4.n_lhs, p4.n_pairs, v4.n_viol FROM p4, v4
)
ORDER BY fd
"""


def association_rules_parts(sf_dir: str, min_support: int = 2) -> pd.DataFrame:
    """ASSOCIATION RULES over the market baskets: every directed rule
    ``antecedent → consequent`` from the frequent pair set, scored by the
    classic triple — support (co-orders), confidence (pair orders /
    antecedent orders) and lift (observed / expected co-occurrence) — the
    recommender / cross-sell step co-occurrence mining feeds.

    Everything is EXACT INTEGER: confidence as floor percent
    ``(100·c_ab) // c_a`` and lift as floor parts-per-million
    ``(10^6·c_ab·N) // (c_a·c_b)`` (all operands positive, so numpy/Python
    floor-div ≡ DuckDB trunc-div; the lift numerator is computed in
    PYTHON ints over the rule-bounded result — no overflow at any corpus
    size, the oracle widens to HUGEINT the same way).

    Physical plan: pair supports come from ``part_pair_cooccurrence``
    (one co-locating exchange + pair combiner), item supports and the
    basket count N from one distinct-(order,part) combiner pass over the
    same projection — three bounded exchanges total. The final score join
    runs over the rule-bounded pair table against the part-DIMENSION
    support vector (the BFS/PageRank node-dim assumption; fact-scale item
    dims would use a bucketed join instead)."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        hash_partition_apply,
        to_pandas_with_schema,
    )

    pairs = to_pandas_with_schema(part_pair_cooccurrence(sf_dir, min_support=min_support))
    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def dedupe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    lp = hash_partition_apply(ds, "l_orderkey", dedupe)
    item = to_pandas_with_schema(
        combiner_aggregate(lp, "l_partkey", {"c": (None, "count")})
    )
    # distinct-basket count: distributed count over the key combiner —
    # the driver sees ONE integer, never the order dimension
    n_baskets = int(combiner_aggregate(ds, "l_orderkey", {"c": (None, "count")}).count())
    empty = pd.DataFrame(
        {
            "antecedent": pd.Series([], dtype=np.int64),
            "consequent": pd.Series([], dtype=np.int64),
            "pair_orders": pd.Series([], dtype=np.int64),
            "ante_orders": pd.Series([], dtype=np.int64),
            "cons_orders": pd.Series([], dtype=np.int64),
            "conf_pct": pd.Series([], dtype=np.int64),
            "lift_ppm": pd.Series([], dtype=np.int64),
        }
    )
    if len(pairs) == 0 or n_baskets == 0:
        return empty
    sup = item.set_index("l_partkey")["c"]
    rules = pd.concat(
        [
            pairs.rename(columns={"part_a": "antecedent", "part_b": "consequent"}),
            pairs.rename(columns={"part_b": "antecedent", "part_a": "consequent"}),
        ],
        ignore_index=True,
    )
    c_ab = rules["n_orders"].to_numpy(np.int64)
    c_a = sup.loc[rules["antecedent"]].to_numpy(np.int64)
    c_b = sup.loc[rules["consequent"]].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "antecedent": rules["antecedent"].to_numpy(np.int64),
            "consequent": rules["consequent"].to_numpy(np.int64),
            "pair_orders": c_ab,
            "ante_orders": c_a,
            "cons_orders": c_b,
            "conf_pct": (100 * c_ab) // c_a,
            # Python-int lane: 10^6·c_ab·N can exceed int64 at real N
            "lift_ppm": np.array(
                [
                    (1_000_000 * int(ab) * n_baskets) // (int(a) * int(b))
                    for ab, a, b in zip(c_ab, c_a, c_b)
                ],
                dtype=np.int64,
            ),
        }
    )
    return out.sort_values(["antecedent", "consequent"]).reset_index(drop=True)


ASSOCIATION_RULES_SQL = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM lineitem),
item AS (SELECT l_partkey AS p, COUNT(*) AS c FROM lp GROUP BY 1),
pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS c_ab
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, c_ab FROM pr
  UNION ALL
  SELECT pb, pa, c_ab FROM pr
)
SELECT r.antecedent, r.consequent,
       CAST(r.c_ab AS BIGINT) AS pair_orders,
       CAST(ia.c AS BIGINT) AS ante_orders,
       CAST(ic.c AS BIGINT) AS cons_orders,
       CAST((100 * r.c_ab) // ia.c AS BIGINT) AS conf_pct,
       CAST((CAST(1000000 AS HUGEINT) * r.c_ab * n.nb)
            // (CAST(ia.c AS HUGEINT) * ic.c) AS BIGINT) AS lift_ppm
FROM rules r
CROSS JOIN n
JOIN item ia ON ia.p = r.antecedent
JOIN item ic ON ic.p = r.consequent
ORDER BY r.antecedent, r.consequent
"""


def user_path_counts(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Sequential path mining: the frequency table of each user's FIRST-k
    event-type path (``view>click>purchase…``) — the navigation-pattern /
    clickstream-journey rollup (SURVEY §2.11 sessionization family, but
    order-sensitive where sessionize is gap-based).

    ONE hash exchange co-locates each user's events; inside a partition
    the path build is integer arithmetic, never per-user string joins:
    sort by (user, ts, event_id), vectorized cumcount rank, local
    factorize of event_type, and each user's path becomes ONE int64 key
    Σ (code+1)·base^rank (base = local vocab + 1) via a C-speed groupby
    sum. Only the partition's DISTINCT path keys (bounded by vocab^k,
    not by users) are decoded back to strings — a ≤base^k loop of k
    divmods. Partials are (path, n_users) rows; the driver folds them
    with one tiny groupby. Lints base^k against int64 before encoding —
    wide event vocabularies at large k need a hash-keyed variant (same
    two-phase recovery as exact dedup) rather than positional encoding."""
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def paths_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rank = p.groupby("user_id", sort=False).cumcount().to_numpy()
        p = p[rank < k]
        rank = rank[rank < k]
        codes, cats = pd.factorize(p["event_type"].to_numpy())
        base = len(cats) + 1
        if base**k >= 2**63:
            raise ValueError(
                f"event vocabulary {len(cats)} at k={k} overflows positional int64 "
                "encoding; use a hashed path key with exact recovery instead"
            )
        contrib = (codes.astype(np.int64) + 1) * np.int64(base) ** rank.astype(np.int64)
        keys = pd.Series(contrib).groupby(p["user_id"].to_numpy(), sort=False).sum()
        uk, counts = np.unique(keys.to_numpy(np.int64), return_counts=True)
        paths = []
        for key in uk:
            words = []
            while key:
                key, d = divmod(key, base)
                words.append(cats[d - 1])
            paths.append(">".join(words))
        return pd.DataFrame(
            {"path": np.array(paths, dtype=object), "n": counts.astype(np.int64)}
        )

    partials = hash_partition_apply(ds, "user_id", paths_part)
    df = to_pandas_with_schema(partials)
    out = df.groupby("path", as_index=False)["n"].sum().rename(columns={"n": "n_users"})
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("path").reset_index(drop=True)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``x`` into the even bit positions (the
    Morton-code interleave half, classic bit-twiddling expansion)."""
    x = x.astype(np.int64) & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_zvalue(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Z-order (Morton) key interleaving the low 16 bits of two
    dimensions — the multi-column data-clustering key (Z-ordered layouts
    give every co-clustered column usable zone maps, where a plain sort
    helps only its leading column). Production layouts feed quantile-
    bucketed dimensions in; the bit interleave is the same."""
    return _part1by1(x) | (_part1by1(y) << 1)


def _sql_interleave(col: str, shift: int) -> str:
    terms = [f"((({col} & 65535) >> {i}) & 1) * {1 << (2 * i + shift)}" for i in range(16)]
    return " + ".join(terms)


def zorder_tile_stats(sf_dir: str, grid_bits: int = 4) -> pd.DataFrame:
    """Z-order tile zone maps over (l_partkey, l_suppkey): rows land in up
    to 2^(2·grid_bits) Morton tiles and each tile reports count + per-
    dimension min/max — exactly the file-level statistics a Z-clustered
    Parquet layout would expose for predicate pushdown on EITHER column.

    Coordinates are RANGE-NORMALIZED to the 16-bit Morton domain with
    exact integer floor-division ((x·65535)//max_x — replayed verbatim by
    the oracle's ``//``), so the grid covers the data at any key scale; a
    metadata-sized max pre-pass (one int pair per batch) supplies the
    bounds. Production layouts use quantile buckets instead of max-scaling
    for skew; the interleave and tiling are identical. The scan-side map
    is three vectorized shift/mask passes; stats are one combiner exchange
    (tiles, never rows). ``tests/test_grouped_stats.py`` proves the layout
    property itself: Z-tiles are 2-D-tight, so a box predicate prunes most
    tiles — which a single-column sort cannot do for the second column."""
    path = table_path(sf_dir, "lineitem")
    ds = rd.read_parquet(path, columns=["l_partkey", "l_suppkey"])

    def max_partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "mpk": [int(pc.max(batch["l_partkey"]).as_py())],
                "msk": [int(pc.max(batch["l_suppkey"]).as_py())],
            }
        )

    m = ds.map_batches(max_partial, batch_format="pyarrow").to_pandas()
    mpk, msk = int(m["mpk"].max()), int(m["msk"].max())
    tile_shift = 2 * (16 - grid_bits)

    def tiles(batch: pa.Table) -> pd.DataFrame:
        pk = batch["l_partkey"].to_numpy().astype(np.int64)
        sk = batch["l_suppkey"].to_numpy().astype(np.int64)
        z = morton_zvalue((pk * 65535) // mpk, (sk * 65535) // msk)
        return pd.DataFrame(
            {"tile": (z >> tile_shift).astype(np.int64), "pk": pk, "sk": sk}
        )

    agg = combiner_aggregate(
        ds.map_batches(tiles, batch_format="pyarrow"),
        "tile",
        {
            "n": (None, "count"),
            "min_partkey": ("pk", "min"),
            "max_partkey": ("pk", "max"),
            "min_suppkey": ("sk", "min"),
            "max_suppkey": ("sk", "max"),
        },
    ).to_pandas()
    for c in ["n", "min_partkey", "max_partkey", "min_suppkey", "max_suppkey"]:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("tile").reset_index(drop=True)


ZORDER_TILE_SQL = f"""
WITH m AS (
  SELECT MAX(l_partkey) AS mpk, MAX(l_suppkey) AS msk FROM lineitem
), nrm AS (
  SELECT l_partkey, l_suppkey,
    (l_partkey * 65535) // mpk AS nx, (l_suppkey * 65535) // msk AS ny
  FROM lineitem, m
), z AS (
  SELECT l_partkey, l_suppkey,
    ({_sql_interleave("nx", 0)} + {_sql_interleave("ny", 1)}) AS zvalue
  FROM nrm
)
SELECT CAST(zvalue >> 24 AS BIGINT) AS tile, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN(l_partkey) AS BIGINT) AS min_partkey, CAST(MAX(l_partkey) AS BIGINT) AS max_partkey,
  CAST(MIN(l_suppkey) AS BIGINT) AS min_suppkey, CAST(MAX(l_suppkey) AS BIGINT) AS max_suppkey
FROM z GROUP BY 1 ORDER BY 1
"""


USER_PATHS_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY path ORDER BY path
"""


PART_PAIR_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY 1, 2
"""


def part_triangle_count(sf_dir: str, min_support: int = 2) -> pd.DataFrame:
    """Distributed TRIANGLE COUNTING on the part co-occurrence graph — the
    graph-analytics clustering primitive (community density; Schank &
    Wagner / Latapy node-iterator with DEGREE ORIENTATION so hot nodes
    cannot explode the wedge set: every edge is directed from its lower-
    (degree, id) endpoint, bounding Σ out-deg² by O(|E|^1.5) regardless of
    skew — the graph analog of the engine's salt-the-hot-key rule).

    Plan: the support-filtered edge set (pair-bounded) MATERIALIZES once
    and feeds three exchanges — a combiner degree count, two bucketed
    joins attaching endpoint degrees, then wedge generation per out-
    neighborhood (the shared repeat/cumsum pair kernel) and ONE
    co-partitioning join that closes wedges against oriented edges.
    Per-partition outputs are single integer counts; the triangle total is
    orientation-invariant, so the oracle's a<b three-way self-join counts
    the identical set."""
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        hash_partition_apply,
        to_pandas_with_schema,
    )

    edges = (
        part_pair_cooccurrence(sf_dir, min_support=min_support)
        .map_batches(
            lambda t: t.select(["part_a", "part_b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_edges = edges.count()

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        nodes = np.concatenate(
            [batch["part_a"].to_numpy(), batch["part_b"].to_numpy()]
        ).astype(np.int64)
        u, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "d": c.astype(np.int64)})

    degs = combiner_aggregate(
        edges.map_batches(deg_partial, batch_format="pyarrow"), "node", {"deg": ("d", "sum")}
    )

    def join_deg(col: str, out: str):
        def m(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            r = rf.rename(columns={"node": col, "deg": out})
            return lf.merge(r, on=col, how="inner")

        return m

    with_da = copartition_apply(edges, degs, "part_a", "node", join_deg("part_a", "deg_a"))
    with_db = copartition_apply(with_da, degs, "part_b", "node", join_deg("part_b", "deg_b"))

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        da = batch["deg_a"].to_numpy(np.int64)
        db = batch["deg_b"].to_numpy(np.int64)
        a = batch["part_a"].to_numpy(np.int64)
        b = batch["part_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))  # a<b always, so ties go a-first
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pd.DataFrame({"u": u, "v": v, "dv": dv})

    oriented = with_db.map_batches(orient, batch_format="pandas").materialize()

    def wedge_part(part: pd.DataFrame) -> pd.DataFrame:
        # pairs of out-neighbors of each u, ordered by the SAME (deg, id)
        # orientation so the closing edge (v, w) is itself oriented v->w
        p = part.sort_values(["u", "dv", "v"], kind="mergesort")
        i_idx, j_idx = _within_group_pair_indices(p["u"].to_numpy(np.int64))
        vv = p["v"].to_numpy(np.int64)
        if len(i_idx) == 0:
            return pd.DataFrame(
                {
                    "wv": pd.Series([], dtype=np.int64),
                    "ww": pd.Series([], dtype=np.int64),
                    "nw": pd.Series([], dtype=np.int64),
                }
            )
        out = pd.DataFrame({"wv": vv[i_idx], "ww": vv[j_idx]})
        return (
            out.groupby(["wv", "ww"], as_index=False).size().rename(columns={"size": "nw"})
        )

    wedges = hash_partition_apply(oriented, "u", wedge_part)

    def close(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        hit = lf.merge(rf, left_on=["wv", "ww"], right_on=["u", "v"], how="inner")
        return pd.DataFrame({"n_tri": [np.int64(hit["nw"].sum())]})

    closed = copartition_apply(
        wedges,
        oriented.map_batches(
            lambda t: t.select(["u", "v"]), batch_format="pyarrow", zero_copy_batch=True
        ),
        "wv",
        "u",
        close,
    )
    parts = to_pandas_with_schema(closed)
    n_tri = int(parts["n_tri"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_edges": [np.int64(n_edges)], "n_triangles": [np.int64(n_tri)]})


TRIANGLE_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS n_triangles
"""


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS sum_lag_us FROM v
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(date_diff('microsecond', v.t1, c.t2)), 0) AS BIGINT)
FROM c JOIN v USING (user_id)
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(date_diff('microsecond', c.t2, p.t3)), 0) AS BIGINT)
FROM p JOIN c USING (user_id)
ORDER BY step
"""


DEBOUNCE_SQL = """
SELECT event_id FROM (
  SELECT event_id,
         COALESCE(
           ts - lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
             >= INTERVAL 1440 MINUTE,
           TRUE
         ) AS keep
  FROM events
) WHERE keep ORDER BY event_id
"""


SESSIONIZE_SQL = """
SELECT user_id,
       CAST(1 + SUM(CASE WHEN gap_new THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         COALESCE(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE, FALSE) AS gap_new
  FROM events
) GROUP BY user_id ORDER BY user_id
"""


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort RETENTION analysis: users bucketed by first-active week, a
    count for every (cohort_week, week_offset) cell they were active in —
    the product-analytics triangle every growth dashboard draws.

    Week indexing is pure integer arithmetic on epoch microseconds
    ((day+3)//7, Monday-aligned) so both engines bucket identically with
    no calendar-convention trap (pandas weeks end Sunday, DuckDB
    date_trunc weeks start Monday — neither is used). ONE hash exchange
    co-locates each user's events; per partition: per-user min week
    (vectorized groupby), distinct (user, week) dedup, offsets by map
    alignment, cell-count partials; the driver folds cells (cohorts ×
    offsets, never rows)."""
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts"])

    def cells(part: pd.DataFrame) -> pd.DataFrame:
        us = part["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        week = (us // 86_400_000_000 + 3) // 7
        d = pd.DataFrame({"user_id": part["user_id"].to_numpy(), "week": week})
        d = d.drop_duplicates()
        first = d.groupby("user_id", sort=False)["week"].transform("min").to_numpy()
        cohort = first
        off = d["week"].to_numpy() - cohort
        out = pd.DataFrame({"cohort_week": cohort, "offset_weeks": off})
        return out.groupby(["cohort_week", "offset_weeks"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = hash_partition_apply(ds, "user_id", cells)
    df = to_pandas_with_schema(partials)
    out = (
        df.groupby(["cohort_week", "offset_weeks"], as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_users"})
        .astype({"cohort_week": "int64", "offset_weeks": "int64", "n_users": "int64"})
    )
    return out.sort_values(["cohort_week", "offset_weeks"]).reset_index(drop=True)


RETENTION_SQL = """
WITH e AS (
  SELECT user_id, (epoch_us(ts) // 86400000000 + 3) // 7 AS week FROM events
), d AS (
  SELECT DISTINCT user_id, week FROM e
), f AS (
  SELECT user_id, MIN(week) AS cohort FROM d GROUP BY user_id
)
SELECT CAST(f.cohort AS BIGINT) AS cohort_week,
       CAST(d.week - f.cohort AS BIGINT) AS offset_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
"""


def session_event_ranks(sf_dir: str, gap_minutes: int = 30) -> "rd.Dataset":
    """Per-event SESSION ASSIGNMENT: each event's session ordinal (gap >
    30 min starts a new session, the ``sessionize_events`` convention)
    and its rank within that session — the event-level decoration the
    per-user session COUNT cannot give (feeds bounce analysis, first/last-
    touch attribution). One co-locating hash exchange; per partition a
    vectorized gap-break cumsum and a (user, session) cumcount — two
    sequential-scan primitives, no per-user Python. Returns the decorated
    events as a canonically sorted Dataset."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def ranks(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = p["user_id"].eq(p["user_id"].shift())
        brk = (same & (p["ts"].diff() > gap)).to_numpy().astype(np.int64)
        brk_cum = np.cumsum(brk)
        u = p["user_id"].to_numpy()
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        user_base = np.maximum.accumulate(np.where(new_user, brk_cum - brk, 0))
        session_id = brk_cum - user_base + 1
        sess = pd.DataFrame({"u": u, "s": session_id})
        rank = sess.groupby(["u", "s"], sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "session_id": session_id.astype(np.int64),
                "rank_in_session": rank.astype(np.int64),
            }
        )

    return hash_partition_apply(ds, "user_id", ranks).sort("event_id")


SESSION_RANKS_SQL = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT event_id, user_id, ts,
         1 + SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM g
)
SELECT event_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS BIGINT)
         AS rank_in_session
FROM s ORDER BY event_id
"""


def json_extract_events(sf_dir: str) -> pd.DataFrame:
    """Vectorized JSON field extraction + grouped rollup.

    Real JSON-path semantics (quoted values, nested objects, malformed rows
    → null) via polars' Rust ``str.json_path_match`` kernel — not a regex."""
    import polars as pl

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["event_type", "props"])

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        k = (
            pl.from_pandas(batch["props"])
            .str.json_path_match("$.k")
            .cast(pl.Int64, strict=False)
            .to_pandas()
        )
        return pd.DataFrame({"event_type": batch["event_type"], "k": k})

    agg = combiner_aggregate(
        ds.map_batches(extract, batch_format="pandas"),
        keys="event_type",
        aggs={"sum_k": ("k", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["sum_k"] = df["sum_k"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


JSON_EXTRACT_SQL = """
SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# -- small operator-coverage queries -------------------------------------


def orders_priority_counts(sf_dir: str) -> pd.DataFrame:
    """Grouped counts + integer-exact min/max money per priority."""
    ds = rd.read_parquet(table_path(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderpriority": batch["o_orderpriority"], "price_c": cents(batch["o_totalprice"])}
        )

    agg = combiner_aggregate(
        ds.map_batches(to_cents, batch_format="pandas"),
        keys="o_orderpriority",
        aggs={"n": (None, "count"), "min_c": ("price_c", "min"), "max_c": ("price_c", "max")},
    ).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    agg["min_price"] = agg["min_c"] / 100.0
    agg["max_price"] = agg["max_c"] / 100.0
    return (
        agg[["o_orderpriority", "n", "min_price", "max_price"]]
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


ORDERS_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(MIN(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS min_price,
       CAST(MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS max_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def union_entity_keys(sf_dir: str) -> pd.DataFrame:
    """Set-op coverage: ``Dataset.union`` of two keyed projections."""
    cust = rd.read_parquet(table_path(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
        lambda t: pa.table(
            {
                "entity": pa.array(["customer"] * t.num_rows),
                "key": pc.cast(t["c_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(table_path(sf_dir, "supplier"), columns=["s_suppkey"]).map_batches(
        lambda t: pa.table(
            {
                "entity": pa.array(["supplier"] * t.num_rows),
                "key": pc.cast(t["s_suppkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = cust.union(supp).to_pandas()
    return out.sort_values(["entity", "key"]).reset_index(drop=True)


UNION_SQL = """
SELECT 'customer' AS entity, c_custkey AS key FROM customer
UNION ALL
SELECT 'supplier', s_suppkey FROM supplier
ORDER BY entity, key
"""


def asof_latest_order_before_event(sf_dir: str) -> "rd.Dataset":
    """As-of join: for every event, the user's latest order date at or
    before the event timestamp (matched DATE is unique per match, so the
    result is deterministic even when order keys tie on a date).

    Adaptive physical plan: the orders side stays a Dataset; ``asof_join``
    broadcasts it while it fits worker heap and switches to the
    co-partitioned bucketed merge_asof beyond (no driver materialization
    of the fact table on that path)."""
    from xmlschema_ray.ops.relational import asof_join

    ev = rd.read_parquet(table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    )
    joined = asof_join(
        ev, orders, left_on="ts", right_on="o_orderdate", left_by="user_id", right_by="o_custkey"
    )

    def shape(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["event_id", "user_id", "o_orderdate"]].rename(
            columns={"o_orderdate": "last_orderdate"}
        )
        out["last_orderdate"] = out["last_orderdate"].astype("datetime64[us]")  # match DuckDB
        return out

    # result stays a Dataset; the canonical sort runs in Ray
    return joined.map_batches(shape, batch_format="pandas").sort("event_id")


ASOF_SQL = """
SELECT e.event_id, e.user_id, o.o_orderdate AS last_orderdate
FROM events e
ASOF LEFT JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


def median_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped median via key co-location: hash-partitioning on the
    group key guarantees every group lands whole in one partition, where a
    single vectorized ``groupby().median()`` computes the exact statistic.
    Partitioning assumption: bounded key cardinality with per-group data
    fitting a worker (true for categorical flags at any corpus size;
    high-cardinality or giant-group quantiles use the engine's mergeable
    histogram quantiles, ``engine/stats.py``, instead)."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity"]
    )

    def med(part: pd.DataFrame) -> pd.DataFrame:
        g = part.assign(q=part["l_quantity"].astype("int64")).groupby(
            "l_returnflag", sort=False
        )["q"]
        return pd.DataFrame({"med": g.median()}).reset_index()

    out = hash_partition_apply(ds, "l_returnflag", med).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


MEDIAN_QUANTITY_SQL = """
SELECT l_returnflag, median(CAST(l_quantity AS BIGINT)) AS med
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def late_event_counts(sf_dir: str, grace_minutes: int = 60) -> pd.DataFrame:
    """Out-of-order / late-data accounting (SURVEY §2.11): per event-time
    day, how many events arrived more than ``grace_minutes`` behind the
    watermark — the lateness audit a streaming ingestion runs to size its
    allowed-lateness windows. The watermark is the RUNNING MAX event time
    over arrival order, a sequential scan made distributed with the
    engine's range-partition + driver-prefix pattern (prefix MAX instead
    of ``global_rank``'s prefix SUM):

    1. range-partition arrival order (sampled boundaries — driver state
       O(partitions));
    2. one combiner pass collects each partition's max event time;
    3. the driver prefix-maxes those into per-partition seeds
       (metadata-sized at any corpus size);
    4. each partition computes its exclusive running max locally, seeded,
       and reduces to per-day (n_events, n_late) partials — one final
       day-keyed combiner merge.

    The fixture's log is perfectly ordered, so arrival order is SIMULATED
    with a deterministic Knuth multiplicative hash of ``event_id`` (pure
    int64 arithmetic — replayed exactly by the oracle's window ORDER BY);
    the operator itself never depends on how the order arises. Lateness
    compares integer microseconds; day keys reduce as epoch-day ints and
    only the day-cardinality result converts to strings.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        derive_num_partitions,
        hash_partition_apply,
        sample_range_bounds,
    )

    grace_us = np.int64(grace_minutes) * 60_000_000
    day_us = np.int64(86_400_000_000)
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["event_id", "ts"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(np.int64)
        ak = ((eid % np.int64(2**31)) * np.int64(2654435761)) % np.int64(2**32)
        return pd.DataFrame(
            {
                "ak": ak,
                "event_id": eid,
                "ts_us": batch["ts"].to_numpy("datetime64[us]").view(np.int64),
            }
        )

    kd = ds.map_batches(keyed, batch_format="pandas").materialize()
    num_partitions = derive_num_partitions()
    bounds = sample_range_bounds(kd, ["ak", "event_id"], num_partitions)

    def add_pid(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        if bounds is None:
            batch["__pid"] = np.int64(0)
            return batch
        ak = batch["ak"].to_numpy(np.int64)
        eid = batch["event_id"].to_numpy(np.int64)
        pid = np.zeros(len(batch), dtype=np.int64)
        for b_ak, b_eid in zip(*bounds):
            pid += (b_ak < ak) | ((b_ak == ak) & (b_eid <= eid))
        batch["__pid"] = pid
        return batch

    with_pid = kd.map_batches(add_pid, batch_format="pandas")
    part_max = (
        combiner_aggregate(with_pid, "__pid", {"mx": ("ts_us", "max")})
        .to_pandas()
        .sort_values("__pid")
    )
    seeds: dict = {}
    run = np.iinfo(np.int64).min
    for pid, mx in zip(part_max["__pid"], part_max["mx"]):
        seeds[int(pid)] = np.int64(run)
        run = max(run, int(mx))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pid, gg in g.groupby("__pid", sort=False):
            gg = gg.sort_values(["ak", "event_id"], kind="mergesort")
            ts = gg["ts_us"].to_numpy(np.int64)
            seed = seeds[int(pid)]
            wm = np.empty(len(ts), dtype=np.int64)
            wm[0] = seed
            if len(ts) > 1:
                np.maximum(np.maximum.accumulate(ts)[:-1], seed, out=wm[1:])
            late = wm > ts + grace_us
            day = ts // day_us
            df = pd.DataFrame({"day": day, "late": late.astype(np.int64)})
            gb = df.groupby("day", sort=False)["late"]
            outs.append(
                pd.DataFrame(
                    {"n_events": gb.size(), "n_late": gb.sum()}
                ).reset_index()
            )
        return pd.concat(outs, ignore_index=True)

    partials = hash_partition_apply(with_pid, "__pid", per_part)
    out = (
        combiner_aggregate(
            partials, "day", {"n_events": ("n_events", "sum"), "n_late": ("n_late", "sum")}
        )
        .to_pandas()
        .astype({"n_events": "int64", "n_late": "int64"})
    )
    out["day"] = pd.to_datetime(out["day"] * 86_400_000_000, unit="us").dt.strftime(
        "%Y-%m-%d"
    )
    return out.sort_values("day").reset_index(drop=True)[["day", "n_events", "n_late"]]


LATE_EVENTS_SQL = """
WITH a AS (
  SELECT event_id, ts,
    ((event_id % 2147483648) * 2654435761) % 4294967296 AS ak
  FROM events
), w AS (
  SELECT ts,
    MAX(ts) OVER (ORDER BY ak, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM a
)
SELECT strftime(ts, '%Y-%m-%d') AS day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COALESCE(SUM(CASE WHEN wm IS NOT NULL
    AND date_diff('microsecond', ts, wm) > 3600000000 THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_late
FROM w GROUP BY day ORDER BY day
"""


def corr_qty_discount_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation via mergeable INTEGER second moments
    (SURVEY §2.7 aggregation family — covariance/correlation are the
    canonical "needs more than sum/min/max" mergeable statistic).

    Per-batch integer partials (n, Σx, Σy, Σx², Σxy, Σy² with x=quantity,
    y=discount cents — both small ints, so products stay well inside
    int64 up to ~10^13 rows; beyond that shift to per-partition central
    moments) merge associatively in ONE combiner exchange; the final
    correlation is one closed-form float expression over identical int64
    sums, evaluated in the same operation order as the oracle SQL — so
    the doubles compare bit-exact. The full-precision float path (pandas
    ``corr``) would diverge from DuckDB's streaming kernel; publishing
    the moments keeps both engines anchored to integers."""
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_discount"]
    )

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["l_quantity"].to_numpy(np.float64).astype(np.int64)
        y = np.asarray(cents(batch["l_discount"]))
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "x": x,
                "y": y,
                "xx": x * x,
                "xy": x * y,
                "yy": y * y,
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        "l_returnflag",
        {
            "n": (None, "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxx": ("xx", "sum"),
            "sxy": ("xy", "sum"),
            "syy": ("yy", "sum"),
        },
    ).to_pandas()
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    sx = agg["sx"].to_numpy(np.int64).astype(np.float64)
    sy = agg["sy"].to_numpy(np.int64).astype(np.float64)
    sxx = agg["sxx"].to_numpy(np.int64).astype(np.float64)
    sxy = agg["sxy"].to_numpy(np.int64).astype(np.float64)
    syy = agg["syy"].to_numpy(np.int64).astype(np.float64)
    agg["corr"] = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    out = agg.astype({c: "int64" for c in ["n", "sx", "sy", "sxx", "sxy", "syy"]})
    return out.sort_values("l_returnflag").reset_index(drop=True)


CORR_QTY_DISCOUNT_SQL = """
WITH p AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
    CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, sx, sy, sxx, sxy, syy,
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM p ORDER BY l_returnflag
"""


def regr_price_on_qty_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped ordinary-least-squares regression (price-vs-quantity trend
    per returnflag) from the SAME mergeable integer second moments as
    :func:`corr_qty_discount_by_flag` — the "fit a line per key" statistic
    every feature-engineering pass needs, computed without ever
    materializing per-group rows.

    Per-batch int64 partials (n, Σx, Σy, Σx², Σxy, Σy²; x = quantity,
    y = price cents) merge associatively through ONE combiner exchange;
    slope / intercept / r² are staged closed-form float expressions over
    identical int64 sums, evaluated in the same operation order as the
    oracle SQL so the doubles compare bit-exact. x ≤ 50 and y ≤ 10^7
    cents keep Σxy inside int64 up to ~10^10 rows per group; beyond that
    the partials shift to per-partition central moments (same note as the
    correlation op). Reference analog: the stats channel's mergeable
    moment sketches (SURVEY §2.7)."""
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["l_quantity"].to_numpy(np.float64).astype(np.int64)
        y = np.asarray(cents(batch["l_extendedprice"]))
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "x": x,
                "y": y,
                "xx": x * x,
                "xy": x * y,
                "yy": y * y,
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        "l_returnflag",
        {
            "n": (None, "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxx": ("xx", "sum"),
            "sxy": ("xy", "sum"),
            "syy": ("yy", "sum"),
        },
    ).to_pandas()
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    sx = agg["sx"].to_numpy(np.int64).astype(np.float64)
    sy = agg["sy"].to_numpy(np.int64).astype(np.float64)
    sxx = agg["sxx"].to_numpy(np.int64).astype(np.float64)
    sxy = agg["sxy"].to_numpy(np.int64).astype(np.float64)
    syy = agg["syy"].to_numpy(np.int64).astype(np.float64)
    # staged exactly as the oracle CTE: cov/varx/vary first, then the
    # derived columns reference those double values
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    agg["slope"] = slope
    agg["intercept"] = (sy - slope * sx) / n
    agg["r2"] = (cov * cov) / (varx * vary)
    out = agg.astype({c: "int64" for c in ["n", "sx", "sy", "sxx", "sxy", "syy"]})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def quantile_sketch_quantity(sf_dir: str) -> pd.DataFrame:
    """The engine's mergeable HISTOGRAM-QUANTILE sketch
    (``engine/stats.py`` ``histogram_quantiles`` — the drift channel's
    distribution summary) brought UNDER THE ORACLE GATE, the
    ``hll_vocab_by_source`` precedent for the second sketch family:
    per-batch fixed-bin int64 histograms merge by addition through one
    combiner exchange (25 integer rows per batch, never values), and the
    p50/p95/p99 finish calls the ENGINE's own interpolation function,
    whose staged float expression the oracle replays verbatim (bin
    selection by integer cumulative counts, linear interpolation within
    the bin) — so the approximate quantiles compare bit-exact, proving
    the sketch machinery itself rather than an estimate tolerance."""
    from xmlschema_ray.engine.stats import histogram_quantiles
    from xmlschema_ray.ops.relational import combiner_aggregate

    edges = np.arange(0.0, 51.0, 2.0)  # 25 bins over the quantity domain
    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_quantity"])

    def hist_partial(batch: pa.Table) -> pd.DataFrame:
        h, _ = np.histogram(batch["l_quantity"].to_numpy(), bins=edges)
        return pd.DataFrame({"bin": np.arange(25, dtype=np.int64), "n": h.astype(np.int64)})

    merged = (
        combiner_aggregate(
            ds.map_batches(hist_partial, batch_format="pyarrow"), "bin", {"n": ("n", "sum")}
        )
        .to_pandas()
        .sort_values("bin")
    )
    hist = np.zeros(25, dtype=np.int64)
    hist[merged["bin"].to_numpy(np.int64)] = merged["n"].to_numpy(np.int64)
    qs = histogram_quantiles(hist, edges, qs=(0.5, 0.95, 0.99))
    return pd.DataFrame(
        {
            "pct": np.array([50, 95, 99], dtype=np.int64),
            "value": [qs["p50"], qs["p95"], qs["p99"]],
        }
    )


QUANTILE_SKETCH_SQL = """
WITH bins AS (
  SELECT LEAST(CAST(floor(l_quantity / 2) AS BIGINT), 24) AS b FROM lineitem
), h AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bins GROUP BY b
), g AS (
  SELECT gs.b, COALESCE(h.n, 0) AS n
  FROM (SELECT unnest(generate_series(0, 24)) AS b) gs LEFT JOIN h USING (b)
), c AS (
  SELECT b, n,
         CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM g
), qv AS (
  SELECT * FROM (VALUES (CAST(50 AS BIGINT), 0.5), (CAST(95 AS BIGINT), 0.95),
                        (CAST(99 AS BIGINT), 0.99)) t(pct, q)
), pick AS (
  SELECT qv.pct, qv.q, MIN(c.b) AS i
  FROM qv JOIN c ON CAST(c.cum AS DOUBLE) >= qv.q * CAST(c.total AS DOUBLE)
  GROUP BY qv.pct, qv.q
)
SELECT p.pct,
       CAST(c.b * 2 AS DOUBLE)
         + ((p.q * CAST(c.total AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.n AS DOUBLE)))
            / CAST(c.n AS DOUBLE)) * 2.0 AS value
FROM pick p JOIN c ON c.b = p.i
ORDER BY p.pct
"""


REGR_PRICE_QTY_SQL = """
WITH p AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS syy
  FROM lineitem GROUP BY l_returnflag
), m AS (
  SELECT *,
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
  FROM p
)
SELECT l_returnflag, n, sx, sy, sxx, sxy, syy,
  cov / varx AS slope,
  (CAST(sy AS DOUBLE) - (cov / varx) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
  (cov * cov) / (varx * vary) AS r2
FROM m ORDER BY l_returnflag
"""


def contingency_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-squared independence analysis of two categorical columns
    (orderpriority × orderstatus) — the per-cell observed/expected table
    with chi² contribution and lift, the column-association diagnostic a
    profiler runs before trusting a categorical feature pair.

    The contingency table is ONE combiner count exchange (cells, never
    rows, cross the wire — |priorities|×|statuses| partial rows per
    batch); row/column marginals and the per-cell floats are closed-form
    over exact int64 counts on the (tiny) cell table, each cell's floats
    a single deterministic scalar expression mirrored verbatim in the
    oracle SQL so doubles compare bit-exact. Deliberately NO float total
    row: a sum of per-cell doubles is order-sensitive, so the exact
    per-cell decomposition IS the contract (the consumer sums at whatever
    precision it wants)."""
    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderpriority", "o_orderstatus"]
    )
    cells = combiner_aggregate(
        ds, ["o_orderpriority", "o_orderstatus"], {"observed": (None, "count")}
    ).to_pandas()
    cells["observed"] = cells["observed"].astype("int64")
    r = cells.groupby("o_orderpriority")["observed"].transform("sum").to_numpy(np.int64)
    c = cells.groupby("o_orderstatus")["observed"].transform("sum").to_numpy(np.int64)
    n = np.int64(cells["observed"].sum())
    o = cells["observed"].to_numpy(np.int64).astype(np.float64)
    rf, cf, nf = r.astype(np.float64), c.astype(np.float64), np.float64(n)
    expected = rf * cf / nf
    cells["row_total"] = r
    cells["col_total"] = c
    cells["n"] = n
    cells["expected"] = expected
    cells["chi2_term"] = (o - expected) * (o - expected) / expected
    cells["lift"] = o * nf / (rf * cf)
    return cells.sort_values(["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)


CONTINGENCY_CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), m AS (
  SELECT *,
    CAST(SUM(observed) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS row_total,
    CAST(SUM(observed) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS col_total,
    CAST(SUM(observed) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT o_orderpriority, o_orderstatus, observed, row_total, col_total, n,
  CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
  (CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE))
    * (CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_term,
  CAST(observed AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)) AS lift
FROM m ORDER BY o_orderpriority, o_orderstatus
"""


def orders_above_customer_avg(sf_dir: str) -> "rd.Dataset":
    """Correlated-subquery DECORRELATION: orders strictly above their own
    customer's average order value — the ``WHERE price > (SELECT AVG …
    correlated)`` shape, executed as the classic decorrelated plan: a
    mergeable per-customer (Σcents, n) combiner (customer-bounded, never
    order rows), ONE co-partitioning join back to the fact stream, and a
    pure-INTEGER comparison ``cents·n > Σcents`` per row — no float
    average ever exists, so the predicate is exact at any parallelism
    (the oracle compares the same integers). Returns qualifying orders as
    a canonically sorted Dataset."""
    from xmlschema_ray.ops.relational import copartition_apply
    from xmlschema_ray.pipelines.common import cents

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(),
                "o_custkey": batch["o_custkey"].to_numpy(),
                "c": cents(batch["o_totalprice"]),
            }
        )

    fact = ds.map_batches(to_cents, batch_format="pandas")
    stats = combiner_aggregate(
        fact, "o_custkey", {"sum_c": ("c", "sum"), "n": (None, "count")}
    )

    def rename_stats(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["cust" if c == "o_custkey" else c for c in t.column_names]
        )

    def above(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(rf, left_on="o_custkey", right_on="cust", how="inner")
        keep = m["c"].to_numpy(np.int64) * m["n"].to_numpy(np.int64) > m["sum_c"].to_numpy(
            np.int64
        )
        return pd.DataFrame({"o_orderkey": m["o_orderkey"].to_numpy()[keep]})

    out = copartition_apply(
        fact,
        stats.map_batches(rename_stats, batch_format="pyarrow", zero_copy_batch=True),
        "o_custkey",
        "cust",
        above,
    )
    return out.sort("o_orderkey")


ORDERS_ABOVE_AVG_SQL = """
WITH c AS (
  SELECT o_orderkey, o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders
), s AS (
  SELECT o_custkey, CAST(SUM(c) AS BIGINT) AS sum_c, CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY o_custkey
)
SELECT c.o_orderkey FROM c JOIN s USING (o_custkey)
WHERE c.c * s.n > s.sum_c ORDER BY o_orderkey
"""


def customers_without_recent_orders(
    sf_dir: str,
    cutoff: str = "1998-06-01",
    distributed_threshold_bytes: Optional[int] = None,
) -> pd.DataFrame:
    """Anti-join: customers with no order at/after ``cutoff``. While the
    CUSTOMER table (the bound on the distinct recent-custkey set) is under
    the gate, the fact side is predicate-pushed at the read and collapsed
    to its DISTINCT key set with a combiner shuffle (one row per custkey
    per batch → hash-partitioned dedup), then broadcast into a vectorized
    NOT-IN filter over the customer scan. Past the gate the key set never
    touches the driver: one co-partitioning exchange of customers against
    the per-batch-distinct recent keys (``semi_join_copartitioned``
    anti direction). Forced-threshold-0 equivalence pinned in
    ``tests/test_distributed_paths.py``."""
    from xmlschema_ray.ops.relational import (
        anti_join,
        hash_partition_apply,
        semi_join_copartitioned,
        to_pandas_with_schema,
    )

    if distributed_threshold_bytes is None:
        distributed_threshold_bytes = DISTRIBUTED_THRESHOLD_BYTES
    recent = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(pd.Timestamp(cutoff))),
    )
    cust = rd.read_parquet(table_path(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    if os.path.getsize(table_path(sf_dir, "customer")) <= distributed_threshold_bytes:
        okeys = hash_partition_apply(
            recent.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
            "o_custkey",
            lambda p: p.drop_duplicates(),
        ).to_pandas()
        out = to_pandas_with_schema(anti_join(cust, okeys, on="c_custkey", key="o_custkey"))
    else:
        out = to_pandas_with_schema(
            semi_join_copartitioned(
                cust, recent, "c_custkey", "o_custkey", keep_members=False
            )
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


CUSTOMERS_WITHOUT_RECENT_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01')
ORDER BY c_custkey
"""


def events_lag_delta(sf_dir: str) -> "rd.Dataset":
    """Per-user LAG window: microseconds since the user's previous event
    (NULL for the first). The per-group ordered-window shape: hash-partition
    by user (co-location guarantee), ONE vectorized sort + shift per
    partition — never a per-row or per-group Python loop. Ordered by
    (ts, event_id) so ties are deterministic."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def lag_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # integer microsecond arithmetic end-to-end — float seconds would
        # round 2^53-scale epoch values
        v = p["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        d = np.zeros(len(v), dtype=np.int64)
        if len(v):
            d[1:] = v[1:] - v[:-1]
        same_user = p["user_id"].eq(p["user_id"].shift()).to_numpy()
        # float64 with NaN for the first-event rows: nullable BIGINT comes
        # back from SQL as float64, and µs deltas are far below 2^53 so the
        # integer values survive exactly
        out = d.astype(np.float64)
        out[~same_user] = np.nan
        return pd.DataFrame(
            {"event_id": p["event_id"], "user_id": p["user_id"], "delta_us": out}
        )

    # result stays a Dataset; the canonical sort runs in Ray
    return hash_partition_apply(ds, "user_id", lag_part).sort("event_id")


LAG_DELTA_SQL = """
SELECT event_id, user_id,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS delta_us
FROM events ORDER BY event_id
"""


def events_rolling_value_sum(sf_dir: str) -> "rd.Dataset":
    """Per-user rolling window (current + 2 preceding rows, ordered by
    ts/event_id): sum of ``value`` in scaled cents — integer window sums
    are order-exact, so the result hash-matches SQL window arithmetic at
    any parallelism (pandas' incremental rolling-sum over floats would
    not)."""
    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import cents

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def roll_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        c = pd.Series(cents(p["value"]), index=p.index)
        roll = c.groupby(p["user_id"], sort=False).rolling(3, min_periods=1).sum()
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "user_id": p["user_id"].to_numpy(),
                "roll3_sum_c": roll.to_numpy(dtype=np.int64),
            }
        )

    # result stays a Dataset; the canonical sort runs in Ray
    return hash_partition_apply(ds, "user_id", roll_part).sort("event_id")


ROLLING_SUM_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_sum_c
FROM events ORDER BY event_id
"""


def events_rolling_zscore(sf_dir: str, window: int = 10) -> "rd.Dataset":
    """Per-user rolling anomaly score: each event's value z-scored against
    its own trailing ``window``-row history — the streaming outlier detector
    (fraud/telemetry spike) built on the same per-key window machinery as
    the rolling sum, but publishing a DERIVED float statistic.

    Exactness: the window carries INTEGER sums (Σc, Σc² of scaled cents);
    z = (c·w − Σc)/√(w·Σc² − (Σc)²) is one closed-form float over those
    ints in the oracle's op order, so doubles hash-match. Rows with an
    incomplete window or zero variance are excluded by INTEGER predicates
    (cnt = w, w·Σc² − (Σc)² > 0) — never by comparing floats. One hash
    exchange co-locates each user's stream; the window scan is two
    vectorized grouped rolling sums per partition."""
    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import cents

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    w = window

    def zscore_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        c = pd.Series(cents(p["value"]), index=p.index)
        g = c.groupby(p["user_id"].to_numpy(), sort=False)
        sum_c = g.rolling(w, min_periods=w).sum().to_numpy()
        sum_c2 = (
            (c * c).groupby(p["user_id"].to_numpy(), sort=False)
            .rolling(w, min_periods=w)
            .sum()
            .to_numpy()
        )
        full = ~np.isnan(sum_c)
        cv = c.to_numpy()[full]
        sc = sum_c[full].astype(np.int64)
        sc2 = sum_c2[full].astype(np.int64)
        var_num = w * sc2 - sc * sc
        ok = var_num > 0
        cf = cv[ok].astype(np.float64)
        scf = sc[ok].astype(np.float64)
        sc2f = sc2[ok].astype(np.float64)
        z = (cf * float(w) - scf) / np.sqrt(float(w) * sc2f - scf * scf)
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy()[full][ok],
                "user_id": p["user_id"].to_numpy()[full][ok],
                "sum_c": sc[ok],
                "sum_c2": sc2[ok],
                "zscore": z,
            }
        )

    return hash_partition_apply(ds, "user_id", zscore_part).sort("event_id")


ROLLING_ZSCORE_SQL = """
WITH c0 AS (
  SELECT event_id, user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), w AS (
  SELECT event_id, user_id, c,
    CAST(COUNT(*) OVER win AS BIGINT) AS cnt,
    CAST(SUM(c) OVER win AS BIGINT) AS sum_c,
    CAST(SUM(c * c) OVER win AS BIGINT) AS sum_c2
  FROM c0
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, sum_c, sum_c2,
  (CAST(c AS DOUBLE) * 10.0 - CAST(sum_c AS DOUBLE))
    / sqrt(10.0 * CAST(sum_c2 AS DOUBLE) - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE)) AS zscore
FROM w
WHERE cnt = 10 AND 10 * sum_c2 - sum_c * sum_c > 0
ORDER BY event_id
"""


def events_rolling_median(sf_dir: str, window: int = 7) -> "rd.Dataset":
    """Per-user rolling MEDIAN of the trailing ``window`` event values —
    the NON-ASSOCIATIVE member of the per-key window family (rolling sum
    and z-score decompose into mergeable partial sums; an order statistic
    does not, so the window scan genuinely needs each key's co-located,
    ordered history — exactly what the one hash exchange provides).

    Exactness: medians are computed over INTEGER cents; with an odd
    window the median IS one of the values (an exact integer), emitted as
    float64 only because DuckDB's ``median()`` (= quantile_cont 0.5)
    returns DOUBLE — both engines pick the identical middle element of
    the identical 7 ints, so doubles hash-match bit-for-bit. Incomplete
    leading windows are excluded by an integer count predicate. Order
    within a user is (ts, event_id) — deterministic under ties — on both
    sides. Per-partition work is pandas' grouped rolling-median kernel
    (O(w log w) amortized per row), vectorized across all users in the
    partition at once."""
    from xmlschema_ray.ops.relational import hash_partition_apply
    from xmlschema_ray.pipelines.common import cents

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    w = window

    def median_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        c = pd.Series(cents(p["value"]), index=p.index)
        med = (
            c.groupby(p["user_id"].to_numpy(), sort=False)
            .rolling(w, min_periods=w)
            .median()
            .to_numpy()
        )
        full = ~np.isnan(med)
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy()[full],
                "user_id": p["user_id"].to_numpy()[full],
                "median_c": med[full],
            }
        )

    return hash_partition_apply(ds, "user_id", median_part).sort("event_id")


ROLLING_MEDIAN_SQL = """
WITH c0 AS (
  SELECT event_id, user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), w AS (
  SELECT event_id, user_id,
    CAST(COUNT(*) OVER win AS BIGINT) AS cnt,
    median(c) OVER win AS median_c
  FROM c0
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, median_c
FROM w
WHERE cnt = 7
ORDER BY event_id
"""


def orders_pivot_status_priority(sf_dir: str) -> pd.DataFrame:
    """Pivot: total order value (cents) by status × priority class. The
    wide aggregate is a combiner shuffle on the (status, priority) pair;
    the pivot itself reshapes the RESULT-sized frame on the driver."""
    from xmlschema_ray.ops.relational import combiner_aggregate
    from xmlschema_ray.pipelines.common import cents

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "status": batch["o_orderstatus"],
                "prio": batch["o_orderpriority"].str.slice(0, 1),
                "c": cents(batch["o_totalprice"]),
            }
        )

    agg = combiner_aggregate(
        ds.map_batches(to_cents, batch_format="pandas"),
        keys=["status", "prio"],
        aggs={"total_c": ("c", "sum")},
    ).to_pandas()
    wide = agg.pivot_table(
        index="status", columns="prio", values="total_c", aggfunc="sum", fill_value=0
    )
    wide = wide.reindex(columns=[str(i) for i in range(1, 6)], fill_value=0)
    wide.columns = [f"p{c}_cents" for c in wide.columns]
    out = wide.reset_index().rename(columns={"status": "o_orderstatus"})
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(COALESCE(SUM(CASE WHEN substr(o_orderpriority,1,1)='1' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END),0) AS BIGINT) AS p1_cents,
       CAST(COALESCE(SUM(CASE WHEN substr(o_orderpriority,1,1)='2' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END),0) AS BIGINT) AS p2_cents,
       CAST(COALESCE(SUM(CASE WHEN substr(o_orderpriority,1,1)='3' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END),0) AS BIGINT) AS p3_cents,
       CAST(COALESCE(SUM(CASE WHEN substr(o_orderpriority,1,1)='4' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END),0) AS BIGINT) AS p4_cents,
       CAST(COALESCE(SUM(CASE WHEN substr(o_orderpriority,1,1)='5' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END),0) AS BIGINT) AS p5_cents
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# -- rollup: multi-level grouped aggregate (GROUPING SETS shape) ---------


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """Revenue at three grouping levels — (flag, status), (flag), () — the
    ``GROUP BY ROLLUP`` shape (SURVEY §2.7 grouped-aggregate family).

    The wide work happens ONCE at the finest level (per-batch scaled-int
    partials → bounded shuffle, same as q1); the coarser levels are exact
    re-sums of the finest-level cube, which is group-cardinality-sized
    (|flags|×|statuses| rows), so deriving them driver-side is free at any
    corpus size. NULL rollup keys are COALESCEd to 'ALL' on both engines to
    keep the compare away from NULL-ordering/NaN-hashing differences."""
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def add_scaled(batch: pd.DataFrame) -> pd.DataFrame:
        price_c = cents(batch["l_extendedprice"])
        disc100 = scaled_int(batch["l_discount"], 100.0)
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "rev_e4": price_c * (100 - disc100),
            }
        )

    fine = combiner_aggregate(
        ds.map_batches(add_scaled, batch_format="pandas"),
        keys=["l_returnflag", "l_linestatus"],
        aggs={"rev_e4": ("rev_e4", "sum"), "n_items": (None, "count")},
    ).to_pandas()

    levels = [fine]
    by_flag = fine.groupby("l_returnflag", as_index=False)[["rev_e4", "n_items"]].sum()
    by_flag["l_linestatus"] = "ALL"
    levels.append(by_flag)
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "rev_e4": [fine["rev_e4"].sum()],
            "n_items": [fine["n_items"].sum()],
        }
    )
    levels.append(total)
    out = pd.concat(levels, ignore_index=True)
    out = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "revenue": out["rev_e4"].astype("int64") / 10000.0,
            "n_items": out["n_items"].astype("int64"),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """Order counts + revenue at ALL FOUR grouping levels of
    (status, priority) — the ``GROUP BY CUBE`` shape. Same plan as
    :func:`revenue_rollup`: the wide pass aggregates ONCE at the finest
    level (scaled-int partials → bounded shuffle); every coarser face of
    the cube is an exact re-sum of that group-cardinality-sized table, so
    deriving them driver-side is free at any corpus size."""
    ds = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def add_scaled(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_c": cents(batch["o_totalprice"]),
            }
        )

    fine = combiner_aggregate(
        ds.map_batches(add_scaled, batch_format="pandas"),
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={"price_c": ("price_c", "sum"), "n_orders": (None, "count")},
    ).to_pandas()

    levels = [fine]
    for keep, alled in (
        (["o_orderstatus"], "o_orderpriority"),
        (["o_orderpriority"], "o_orderstatus"),
    ):
        lv = fine.groupby(keep, as_index=False)[["price_c", "n_orders"]].sum()
        lv[alled] = "ALL"
        levels.append(lv)
    levels.append(
        pd.DataFrame(
            {
                "o_orderstatus": ["ALL"],
                "o_orderpriority": ["ALL"],
                "price_c": [fine["price_c"].sum()],
                "n_orders": [fine["n_orders"].sum()],
            }
        )
    )
    out = pd.concat(levels, ignore_index=True)
    out = pd.DataFrame(
        {
            "o_orderstatus": out["o_orderstatus"],
            "o_orderpriority": out["o_orderpriority"],
            "total_price": out["price_c"].astype("int64") / 100.0,
            "n_orders": out["n_orders"].astype("int64"),
        }
    )
    return out.sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# -- argmin per group with carried columns (first-order-per-customer) ----


def first_order_per_customer(sf_dir: str) -> "rd.Dataset":
    """Each customer's earliest order (tiebreak: lowest orderkey), with the
    full order row carried through — the argmin-per-group pattern.

    Per-batch pre-reduce (one candidate row per custkey per batch) before
    the shuffle, so the exchange ships at most |customers| rows per batch
    instead of the orders fact; the hash-partitioned merge re-applies the
    same vectorized sort+first, which is associative. Result stays a
    Dataset with the canonical sort done in Ray."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def first_per_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        b = b.drop_duplicates("o_custkey", keep="first")
        b["o_orderdate"] = pd.to_datetime(b["o_orderdate"]).astype("datetime64[us]")
        return b.reset_index(drop=True)

    partials = ds.map_batches(first_per_key, batch_format="pandas")
    return hash_partition_apply(partials, "o_custkey", first_per_key).sort("o_custkey")


FIRST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey
"""


# -- global rank / NTILE via range partitioning --------------------------


def orders_price_ntile(sf_dir: str, n_buckets: int = 4) -> "rd.Dataset":
    """Exact global NTILE over a total order WITHOUT a driver-side sort —
    the distributed global-rank pattern (SURVEY §2.8 sort family):

    1. a deterministic systematic sample of sort keys picks range
       boundaries (driver state = one small boundary array);
    2. every row gets its range-partition id from a vectorized
       lexicographic compare against the boundaries;
    3. per-partition row COUNTS (a tiny combiner aggregate, one row per
       partition) prefix-sum into rank offsets on the driver — metadata-
       sized at any corpus size, never row data;
    4. each partition sorts locally and emits offset + local rank; the
       NTILE bucket is a closed-form function of (global rank, total).

    The total order is (price cents, orderkey) — ties broken by the unique
    key so both engines produce the identical permutation. The rank itself
    comes from the shared :func:`~xmlschema_ray.ops.relational.global_rank`
    op; the NTILE bucket is a closed-form function of (rank, total)."""
    from xmlschema_ray.ops.relational import global_rank

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].astype("int64"),
                "o_totalprice": batch["o_totalprice"],
                "price_c": cents(batch["o_totalprice"]),
            }
        )

    ranked, total = global_rank(
        ds.map_batches(keyed, batch_format="pandas"),
        ["price_c", "o_orderkey"],
        rank_col="__rank",
    )
    q, r = divmod(total, n_buckets)
    cut = r * (q + 1)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        rank = batch["__rank"].to_numpy(np.int64)
        if q == 0:
            bucket = rank
        else:
            bucket = np.where(rank <= cut, (rank - 1) // (q + 1) + 1, r + (rank - cut - 1) // q + 1)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(),
                "o_totalprice": batch["o_totalprice"].to_numpy(),
                "bucket": bucket.astype(np.int64),
            }
        )

    return ranked.map_batches(finish, batch_format="pandas").sort("o_orderkey")


NTILE_SQL = """
SELECT o_orderkey, o_totalprice,
       CAST(NTILE(4) OVER (ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey) AS BIGINT) AS bucket
FROM orders
ORDER BY o_orderkey
"""


def repeat_orders_within_30d(sf_dir: str) -> "rd.Dataset":
    """Per-customer temporal RANGE join (SURVEY §2.6 custom-join family):
    every (order, earlier order of the same customer within 30 days) pair
    — the repeat-purchase window join. The self-join path reads and
    exchanges the fact ONCE (each co-located key group serves as both
    sides), per-key binary-search matching, pair materialization as
    integer array math (:func:`~xmlschema_ray.ops.relational.range_self_join`)."""
    import numpy as np

    from xmlschema_ray.ops.relational import range_self_join

    cols = ["o_orderkey", "o_custkey", "o_orderdate"]
    orders = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols)

    pairs = range_self_join(
        orders,
        key="o_custkey",
        time_col="o_orderdate",
        lo_offset=np.timedelta64(-30, "D"),
        hi_offset=np.timedelta64(0, "D"),
        rename={"o_orderkey": "prev_orderkey", "o_orderdate": "prev_orderdate"},
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].astype("int64"),
                "o_custkey": batch["o_custkey"].astype("int64"),
                "o_orderdate": batch["o_orderdate"].astype("datetime64[us]"),
                "prev_orderkey": batch["prev_orderkey"].astype("int64"),
                "prev_orderdate": batch["prev_orderdate"].astype("datetime64[us]"),
            }
        )

    # a repeat-free orders table is a LEGITIMATE empty result — guard the
    # sort's schema-less-empty behavior (see common.sorted_or_typed_empty);
    # the whole upstream is exchanges, so supply the typed template
    template = pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "prev_orderkey": pd.Series([], dtype="int64"),
            "prev_orderdate": pd.Series([], dtype="datetime64[us]"),
        }
    )
    return sorted_or_typed_empty(
        pairs.map_batches(finish, batch_format="pandas"),
        ["o_orderkey", "prev_orderkey"],
        template=template,
    )


REPEAT_ORDERS_SQL = """
SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
       b.o_orderkey AS prev_orderkey, b.o_orderdate AS prev_orderdate
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate >= a.o_orderdate - INTERVAL 30 DAY
 AND b.o_orderdate < a.o_orderdate
ORDER BY a.o_orderkey, prev_orderkey
"""


def customer_event_counts(sf_dir: str) -> "rd.Dataset":
    """LEFT OUTER join with genuine unmatched rows: every customer with
    their event count, 0 for the ~2/3 of customers with no events. The
    fact side pre-aggregates to key-space-sized counts (combiner) BEFORE
    the single co-partitioning exchange, then one vectorized left merge
    per partition (``hash_bucket_join(how='left')``)."""
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_bucket_join

    cust = rd.read_parquet(table_path(sf_dir, "customer"), columns=["c_custkey"])
    ev = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id"])
    counts = combiner_aggregate(ev, keys="user_id", aggs={"n_events": (None, "count")})
    joined = hash_bucket_join(cust, counts, "c_custkey", "user_id", how="left")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].astype("int64"),
                "n_events": batch["n_events"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas").sort("c_custkey")


CUSTOMER_EVENT_COUNTS_SQL = """
SELECT c_custkey,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
FROM customer
LEFT JOIN (SELECT user_id, count(*) AS n FROM events GROUP BY user_id) e
  ON c_custkey = e.user_id
ORDER BY c_custkey
"""


def customers_without_events(sf_dir: str) -> "rd.Dataset":
    """Set difference (EXCEPT DISTINCT, SURVEY §2.9 set-op family):
    customers with no event activity. Both sides collapse to per-batch
    distinct partials before the one key-space-sized exchange — see
    :func:`xmlschema_ray.ops.relational.except_keys`."""
    from xmlschema_ray.ops.relational import except_keys

    cust = rd.read_parquet(table_path(sf_dir, "customer"), columns=["c_custkey"])
    ev = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id"])
    template = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return sorted_or_typed_empty(
        except_keys(cust, ev, "c_custkey", "user_id"), "c_custkey", template=template
    )


CUSTOMERS_WITHOUT_EVENTS_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id FROM events
ORDER BY c_custkey
"""


def winsorized_price_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped winsorization (outlier-robust feature clipping): per
    return flag, clip extendedprice to the group's [p25, p75] and report
    clip counts plus the winsorized sum. The robust-aggregate companion
    to the MAD filter — bounds what extreme rows can contribute instead
    of dropping them.

    Quantiles are holistic ⇒ one flag-keyed co-location exchange (3
    groups; the ``chars_quartiles_by_source`` pattern). Float parity is
    engineered, not hoped for: prices become integer cents first, the
    .25/.75 interpolation weights make each quantile an exact multiple
    of 0.25, and sums of exact quarter-cent multiples stay exact below
    2^53 — so the winsorized sum is order-independent and bit-equal to
    DuckDB's parallel SUM regardless of partitioning."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"), columns=["l_returnflag", "l_extendedprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "cents": cents(batch["l_extendedprice"]),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, gg in g.groupby("l_returnflag", sort=False):
            x = gg["cents"].to_numpy(np.float64)
            lo, hi = np.percentile(x, [25.0, 75.0])
            rows.append(
                (
                    flag,
                    len(x),
                    int((x < lo).sum()),
                    int((x > hi).sum()),
                    float(np.sum(np.clip(x, lo, hi))) / 100.0,
                )
            )
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([r[0] for r in rows], dtype=object),
                "n": pd.Series([r[1] for r in rows], dtype="int64"),
                "n_clipped_low": pd.Series([r[2] for r in rows], dtype="int64"),
                "n_clipped_high": pd.Series([r[3] for r in rows], dtype="int64"),
                "winsorized_sum": pd.Series([r[4] for r in rows], dtype="float64"),
            }
        )

    out = hash_partition_apply(
        ds.map_batches(to_cents, batch_format="pandas"), "l_returnflag", per_part
    ).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


WINSORIZED_PRICE_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
), q AS (
  SELECT l_returnflag,
         quantile_cont(CAST(cents AS DOUBLE), 0.25) AS lo,
         quantile_cont(CAST(cents AS DOUBLE), 0.75) AS hi
  FROM c GROUP BY l_returnflag
)
SELECT c.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       SUM(least(greatest(CAST(cents AS DOUBLE), lo), hi)) / 100.0 AS winsorized_sum
FROM c JOIN q USING (l_returnflag)
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
"""


def orders_snapshot_diff(sf_dir: str) -> "rd.Dataset":
    """Snapshot reconciliation (CDC diff) between two versions of the
    orders table: version B is derived deterministically from version A
    (delete keys ≡0 mod 97, bump totalprice on keys ≡0 mod 89, clone
    keys ≡0 mod 101 under key+10^9), then
    :func:`~xmlschema_ray.ops.relational.snapshot_diff` classifies every
    key as added / removed / changed through one co-partitioning
    exchange. The incremental-ingest audit a production table pipeline
    runs between snapshot loads."""
    from xmlschema_ray.ops.relational import snapshot_diff

    cols = ["o_orderkey", "o_totalprice"]
    a = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols)

    def derive_b(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["o_orderkey"].to_numpy(np.int64)
        v = batch["o_totalprice"].to_numpy(np.float64)
        keep = k % 97 != 0
        kk, vv = k[keep], v[keep].copy()
        vv[kk % 89 == 0] += 1.0
        clone = k % 101 == 0
        return pd.DataFrame(
            {
                "o_orderkey": np.concatenate([kk, k[clone] + 1_000_000_000]),
                "o_totalprice": np.concatenate([vv, v[clone]]),
            }
        )

    b = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols).map_batches(
        derive_b, batch_format="pandas"
    )
    template = pd.DataFrame(
        {"o_orderkey": pd.Series([], dtype="int64"), "change": pd.Series([], dtype=object)}
    )
    return sorted_or_typed_empty(
        snapshot_diff(a, b, "o_orderkey", ["o_totalprice"]), "o_orderkey", template=template
    )


def orders_apply_changes(sf_dir: str) -> "rd.Dataset":
    """MERGE INTO / upsert: apply a compacted CDC change feed to the
    orders snapshot and emit the NEW snapshot — the write-side complement
    of :func:`orders_snapshot_diff` (same deterministic feed: deletes on
    keys ≡0 mod 97, price bumps on surviving keys ≡0 mod 89, cloned
    inserts under key+10^9 for keys ≡0 mod 101), so applying this merge
    reproduces exactly the version-B table the diff query reconciles
    against. One co-partitioning exchange via
    :func:`~xmlschema_ray.ops.relational.merge_into`; price mutation is
    +1.0 on an untouched double (bit-identical in both engines)."""
    from xmlschema_ray.ops.relational import merge_into

    cols = ["o_orderkey", "o_totalprice"]
    base = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols)
    feed = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols).map_batches(
        _orders_cdc_feed, batch_format="pandas"
    )
    return merge_into(base, feed, "o_orderkey").sort("o_orderkey")


def _orders_cdc_feed(batch: pd.DataFrame) -> pd.DataFrame:
    """The suite's deterministic compacted CDC feed over orders (shared by
    the merge, IVM and bucketed-compaction queries): deletes on keys ≡0
    mod 97, price bumps on surviving keys ≡0 mod 89, cloned inserts under
    key+10^9 for keys ≡0 mod 101."""
    k = batch["o_orderkey"].to_numpy(np.int64)
    v = batch["o_totalprice"].to_numpy(np.float64)
    dels = k % 97 == 0
    bump = (k % 89 == 0) & ~dels
    clone = k % 101 == 0
    return pd.DataFrame(
        {
            "o_orderkey": np.concatenate([k[dels], k[bump], k[clone] + 1_000_000_000]),
            "action": np.concatenate(
                [
                    np.full(int(dels.sum()), "delete", dtype=object),
                    np.full(int(bump.sum()), "upsert", dtype=object),
                    np.full(int(clone.sum()), "upsert", dtype=object),
                ]
            ),
            "o_totalprice": np.concatenate([np.full(int(dels.sum()), np.nan), v[bump] + 1.0, v[clone]]),
        }
    )


def orders_compact_bucketed(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """CDC COMPACTION against the hash-bucketed layout
    (:func:`~xmlschema_ray.sources.bucketed.compact_bucketed`): the same
    deterministic feed :func:`orders_apply_changes` merges in-stream is
    here applied to the ON-DISK layout, producing a new generation whose
    read-back equals the merged snapshot — the Iceberg/Delta
    MERGE-and-rewrite shape. The feed pays ONE co-locating exchange;
    touched buckets are merged and rewritten by their owning task with
    ZERO exchange of the base (write-time co-partitioning already paid
    it); untouched buckets carry over as hard links (metadata-only), so a
    1%-of-buckets feed rewrites 1% of a 100-TB table. The oracle is the
    plain SQL merge — proving compaction ≡ in-stream MERGE INTO
    end-to-end through the storage layer."""
    import shutil
    import tempfile

    from xmlschema_ray.sources.bucketed import (
        BUCKET_MANIFEST,
        HASH_TAG as BUCKET_HASH_TAG,
        compact_bucketed,
        read_bucketed,
        write_bucketed,
    )

    root = os.path.join(
        "/tmp/xmlschema_ray_bucketed", os.path.basename(os.path.normpath(sf_dir))
    )
    os.makedirs(root, exist_ok=True)
    cache = os.path.join(root, "orders_kv")
    cols = ["o_orderkey", "o_totalprice"]
    # self-heal a warm /tmp cache written under an older bucket hash
    if not layout_cache_fresh(cache, BUCKET_MANIFEST, BUCKET_HASH_TAG):
        ds = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols)
        tmp = f"{cache}.build{os.getpid()}"
        # a crashed same-pid build leaves stale parquet the layout
        # writers now refuse — clear it before building
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
        write_bucketed(ds, "o_orderkey", tmp, num_buckets)
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    feed = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols).map_batches(
        _orders_cdc_feed, batch_format="pandas"
    )
    gen2 = tempfile.mkdtemp(dir=root, prefix="orders_kv_gen2_")
    try:
        compact_bucketed(cache, feed, gen2)
        out = read_bucketed(gen2).to_pandas()
    finally:
        shutil.rmtree(gen2, ignore_errors=True)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def join_ivm_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """DELTA-JOIN incremental view maintenance: keep a materialized JOIN
    aggregate — revenue and item counts per (order priority, return flag)
    over orders ⋈ lineitem — correct under CDC feeds on BOTH sides
    without recomputing the join, the Δ(A⋈B) = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB rule
    every view-maintenance engine implements (here folded per join key:
    orders are unique per key, so each TOUCHED key contributes
    −old_priority⊗S_old + new_priority⊗S_new, which covers all three
    delta terms at once and cannot double-count the ΔA⋈ΔB corner).

    Feeds (deterministic pure functions, so the oracle rebuilds version-B
    independently and recomputes the view FROM SCRATCH — proving delta
    maintenance ≡ recomputation): orders delete keys ≡0 mod 97 and flip
    surviving keys ≡0 mod 89 to priority '9-MAINT'; lineitem deletes rows
    with (orderkey+partkey) ≡0 mod 93 and inserts clones (+100 cents) for
    rows ≡0 mod 101.

    Cost shape: the view seed pays the join ONCE (copartition +
    per-partition agg partials + one small combiner); maintenance then
    touches only (a) the feeds, (b) a semi-join-PRUNED scan of each base
    projection against the broadcast touched-key set (one streaming pass,
    no exchange of untouched keys), and (c) a driver fold over
    touched-key × flag rows — all bounded by the feed, never the corpus.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"],
    )

    def li_proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "l_partkey": b["l_partkey"].astype("int64"),
                "l_returnflag": b["l_returnflag"],
                "price_c": cents(b["l_extendedprice"]),
            }
        )

    lip = li.map_batches(li_proj, batch_format="pandas")

    # ---- view seed: the join aggregate, paid once -----------------------
    def vold_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype=object),
                    "l_returnflag": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype=np.int64),
                    "revenue_c": pd.Series([], dtype=np.int64),
                }
            )
        m = rf.merge(lf, left_on="l_orderkey", right_on="o_orderkey")
        return (
            m.groupby(["o_orderpriority", "l_returnflag"], as_index=False)
            .agg(n_items=("price_c", "size"), revenue_c=("price_c", "sum"))
        )

    v_old = to_pandas_with_schema(
        combiner_aggregate(
            copartition_apply(orders, lip, "o_orderkey", "l_orderkey", vold_part),
            ["o_orderpriority", "l_returnflag"],
            {"n_items": ("n_items", "sum"), "revenue_c": ("revenue_c", "sum")},
        )
    )

    # ---- feeds + touched keys -------------------------------------------
    def li_feed(b: pd.DataFrame) -> pd.DataFrame:
        k = b["l_orderkey"].to_numpy(np.int64)
        p = b["l_partkey"].to_numpy(np.int64)
        pc_ = b["price_c"].to_numpy(np.int64)
        fl = b["l_returnflag"].to_numpy(object)
        dels = (k + p) % 93 == 0
        ins = (k + p) % 101 == 0
        return pd.DataFrame(
            {
                "l_orderkey": np.concatenate([k[dels], k[ins]]),
                "l_returnflag": np.concatenate([fl[dels], fl[ins]]),
                "dn": np.concatenate(
                    [np.full(int(dels.sum()), -1), np.full(int(ins.sum()), 1)]
                ).astype(np.int64),
                "dprice": np.concatenate([-pc_[dels], pc_[ins] + 100]).astype(np.int64),
            }
        )

    feed_l = lip.map_batches(li_feed, batch_format="pandas")
    s_delta = to_pandas_with_schema(
        combiner_aggregate(
            feed_l,
            ["l_orderkey", "l_returnflag"],
            {"dn": ("dn", "sum"), "dprice": ("dprice", "sum")},
        )
    )

    def o_touched(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        m = (k % 97 == 0) | (k % 89 == 0)
        return pd.DataFrame({"k": k[m]})

    tk_orders = to_pandas_with_schema(
        combiner_aggregate(
            orders.map_batches(o_touched, batch_format="pandas"),
            "k",
            {"c": (None, "count")},
        )
    )
    touched = np.unique(
        np.concatenate(
            [
                tk_orders["k"].to_numpy(np.int64) if len(tk_orders) else np.array([], np.int64),
                s_delta["l_orderkey"].to_numpy(np.int64) if len(s_delta) else np.array([], np.int64),
            ]
        )
    )
    t_ref = ray.put(touched)

    # ---- pruned passes: S_old per (touched key, flag), old priorities ---
    def prune_li(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(t_ref) if isinstance(t_ref, ray.ObjectRef) else t_ref
        m = np.isin(b["l_orderkey"].to_numpy(np.int64), t)
        sub = b[m]
        if len(sub) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series([], dtype=np.int64),
                    "l_returnflag": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                    "rev": pd.Series([], dtype=np.int64),
                }
            )
        return (
            sub.groupby(["l_orderkey", "l_returnflag"], as_index=False)
            .agg(n=("price_c", "size"), rev=("price_c", "sum"))
        )

    s_old = to_pandas_with_schema(
        combiner_aggregate(
            lip.map_batches(prune_li, batch_format="pandas"),
            ["l_orderkey", "l_returnflag"],
            {"n": ("n", "sum"), "rev": ("rev", "sum")},
        )
    )

    def prune_orders(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(t_ref) if isinstance(t_ref, ray.ObjectRef) else t_ref
        m = np.isin(b["o_orderkey"].to_numpy(np.int64), t)
        return b[m][["o_orderkey", "o_orderpriority"]]

    a_old = to_pandas_with_schema(
        orders.map_batches(prune_orders, batch_format="pandas")
    )

    # ---- driver fold over touched-key × flag rows (feed-sized) ----------
    prio_of = dict(zip(a_old["o_orderkey"].astype(np.int64), a_old["o_orderpriority"]))
    pairs: dict = {}
    for df_, cols in ((s_old, ("n", "rev")), (s_delta, ("dn", "dprice"))):
        for row in df_.itertuples(index=False):
            key = (int(row.l_orderkey), row.l_returnflag)
            e = pairs.setdefault(key, [0, 0, 0, 0])  # n_old, rev_old, dn, drev
            if cols[0] == "n":
                e[0] += int(row.n)
                e[1] += int(row.rev)
            else:
                e[2] += int(row.dn)
                e[3] += int(row.dprice)
    deltas: dict = {}
    for (k, fl), (n0, r0, dn, dr) in pairs.items():
        old_prio = prio_of.get(k)
        if old_prio is None:
            continue  # order never existed: no contribution either side
        exists_new = k % 97 != 0
        new_prio = "9-MAINT" if k % 89 == 0 else old_prio
        d = deltas.setdefault((old_prio, fl), [0, 0])
        d[0] -= n0
        d[1] -= r0
        if exists_new:
            d = deltas.setdefault((new_prio, fl), [0, 0])
            d[0] += n0 + dn
            d[1] += r0 + dr
    d_df = pd.DataFrame(
        [(p, f, n, r) for (p, f), (n, r) in deltas.items()],
        columns=["o_orderpriority", "l_returnflag", "n_items", "revenue_c"],
    )
    merged = (
        pd.concat([v_old, d_df], ignore_index=True)
        .groupby(["o_orderpriority", "l_returnflag"], as_index=False)[["n_items", "revenue_c"]]
        .sum()
    )
    merged = merged[merged["n_items"] > 0]
    merged["n_items"] = merged["n_items"].astype("int64")
    merged["revenue_c"] = merged["revenue_c"].astype("int64")
    return merged.sort_values(["o_orderpriority", "l_returnflag"]).reset_index(drop=True)


JOIN_IVM_SQL = """
WITH a_new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN '9-MAINT' ELSE o_orderpriority END AS prio
  FROM orders WHERE o_orderkey % 97 <> 0
), b_base AS (
  SELECT l_orderkey, l_partkey, l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM lineitem
), b_new AS (
  SELECT l_orderkey, l_returnflag, price_c FROM b_base WHERE (l_orderkey + l_partkey) % 93 <> 0
  UNION ALL
  SELECT l_orderkey, l_returnflag, price_c + 100 FROM b_base WHERE (l_orderkey + l_partkey) % 101 = 0
)
SELECT a.prio AS o_orderpriority, b.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(b.price_c) AS BIGINT) AS revenue_c
FROM a_new a JOIN b_new b ON a.o_orderkey = b.l_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def orders_status_counts_ivm(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL VIEW MAINTENANCE: keep a materialized aggregate (order
    counts by status) correct under a CDC feed at O(feed) cost instead of
    recomputing over the corpus — the delta-propagation rule every
    materialized-view engine implements for SUM/COUNT views.

    The feed carries only (key, action, new_status) — NO old values, as
    real change feeds don't — so the update is a two-step distributed
    plan: ONE co-partitioning join of the feed against the base table
    recovers each touched key's OLD status (feed-sized, the only work
    proportional to anything), emitting ±1 delta rows (delete → −old;
    update → −old, +new; insert → +new); a status-keyed combiner folds
    deltas and the driver applies them to the |status|-row view. The feed
    is the deterministic CDC stream of ``orders_apply_changes`` plus a
    status flip to 'X' on keys ≡0 mod 89, so the oracle (and the test's
    direct recompute) rebuild the same version-B table independently —
    proving delta maintenance equals recomputation.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    cols = ["o_orderkey", "o_orderstatus"]
    base = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols)
    view = to_pandas_with_schema(
        combiner_aggregate(base, "o_orderstatus", {"n": (None, "count")})
    ).set_index("o_orderstatus")["n"].astype("int64")

    def derive_feed(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["o_orderkey"].to_numpy(np.int64)
        s = batch["o_orderstatus"].to_numpy()
        dels = k % 97 == 0
        flip = (k % 89 == 0) & ~dels
        clone = k % 101 == 0
        return pd.DataFrame(
            {
                "o_orderkey": np.concatenate([k[dels], k[flip], k[clone] + 1_000_000_000]),
                "action": np.concatenate(
                    [
                        np.full(int(dels.sum()), "delete", dtype=object),
                        np.full(int(flip.sum()), "upsert", dtype=object),
                        np.full(int(clone.sum()), "upsert", dtype=object),
                    ]
                ),
                "new_status": np.concatenate(
                    [np.full(int(dels.sum()), None, dtype=object), np.full(int(flip.sum()), "X", dtype=object), s[clone]]
                ),
            }
        )

    feed = rd.read_parquet(table_path(sf_dir, "orders"), columns=cols).map_batches(
        derive_feed, batch_format="pandas"
    )

    def deltas(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(rf, on="o_orderkey", how="left")
        outs = []
        known = m["o_orderstatus"].notna()
        if known.any():
            outs.append(
                pd.DataFrame({"o_orderstatus": m.loc[known, "o_orderstatus"], "d": -1})
            )
        ups = m["action"] == "upsert"
        if ups.any():
            outs.append(pd.DataFrame({"o_orderstatus": m.loc[ups, "new_status"], "d": 1}))
        if not outs:
            return pd.DataFrame(
                {"o_orderstatus": pd.Series([], dtype=object), "d": pd.Series([], dtype="int64")}
            )
        out = pd.concat(outs, ignore_index=True)
        out["d"] = out["d"].astype("int64")
        return out.groupby("o_orderstatus", as_index=False)["d"].sum()

    delta_ds = copartition_apply(feed, base, "o_orderkey", "o_orderkey", deltas)
    delta = to_pandas_with_schema(
        combiner_aggregate(delta_ds, "o_orderstatus", {"d": ("d", "sum")})
    ).set_index("o_orderstatus")["d"].astype("int64")

    new = view.add(delta, fill_value=0).astype("int64")
    new = new[new > 0]
    return (
        pd.DataFrame({"o_orderstatus": new.index.to_numpy(object), "n": new.to_numpy(np.int64)})
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )


ORDERS_STATUS_IVM_SQL = """
WITH a AS (SELECT o_orderkey AS k, o_orderstatus AS s FROM orders),
b AS (
  SELECT k, CASE WHEN k % 89 = 0 THEN 'X' ELSE s END AS s FROM a WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 1000000000, s FROM a WHERE k % 101 = 0
)
SELECT s AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1
"""


ORDERS_APPLY_CHANGES_SQL = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders
), b AS (
  SELECT k, CASE WHEN k % 89 = 0 THEN v + 1 ELSE v END AS v FROM a WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 1000000000 AS k, v FROM a WHERE k % 101 = 0
)
SELECT k AS o_orderkey, v AS o_totalprice FROM b ORDER BY o_orderkey
"""


def event_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition estimation over per-user event
    streams: counts and conditional probabilities of (previous type →
    type) steps — the behavioral-model fit every session-analytics stack
    runs on its clickstream. ONE hash exchange co-locates user streams;
    the lag is a vectorized sort+shift per partition; (prev, next) pair
    counts collapse through a combiner exchange (|types|² keys). The
    probability column is one float division over exact int64 counts,
    computed on the result-sized matrix in the oracle's op order."""
    from xmlschema_ray.ops.relational import hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def lag_pairs(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = p["user_id"].eq(p["user_id"].shift()).to_numpy()
        prev = p["event_type"].shift().to_numpy()
        cur = p["event_type"].to_numpy()
        return pd.DataFrame({"prev_type": prev[same], "event_type": cur[same]})

    pairs = hash_partition_apply(ds, "user_id", lag_pairs)
    agg = combiner_aggregate(
        pairs, ["prev_type", "event_type"], {"n": (None, "count")}
    ).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    row_tot = agg.groupby("prev_type")["n"].transform("sum").to_numpy(np.int64)
    agg["p"] = agg["n"].to_numpy(np.int64).astype(np.float64) / row_tot.astype(np.float64)
    return agg.sort_values(["prev_type", "event_type"]).reset_index(drop=True)


def _scd2_intervals_part(part: pd.DataFrame) -> pd.DataFrame:
    """Per-partition SCD2 change scan (whole user streams per partition):
    vectorized sort + shift with (ts, event_id) tie order, version =
    within-user cumsum over change starts, ``valid_to`` = next change's
    ``valid_from`` (NaT on the open current version). Shared by the
    history build (``user_type_scd2``) and the point-in-time enrichment
    (``orders_scd2_enrich``)."""
    p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = p["user_id"].to_numpy(np.int64)
    typ = p["event_type"].to_numpy()
    # explicit unit: partition frames can carry ts as object dtype, and an
    # all-NaT object column would infer Arrow `null` downstream
    ts = p["ts"].to_numpy("datetime64[us]")
    new_user = np.empty(len(p), dtype=bool)
    if len(p):
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
    change = new_user | (typ != np.roll(typ, 1))
    c_uid = uid[change]
    c_from = ts[change]
    # version ordinal: cumulative change count within each user
    ver = np.arange(1, change.sum() + 1, dtype=np.int64)
    if len(ver):
        user_start = np.flatnonzero(
            np.concatenate([[True], c_uid[1:] != c_uid[:-1]])
        )
        base = np.repeat(ver[user_start] - 1, np.diff(np.append(user_start, len(ver))))
        ver = ver - base
    # valid_to = next change's valid_from within the same user
    nxt = np.roll(c_from, -1)
    last_of_user = np.concatenate([c_uid[1:] != c_uid[:-1], [True]]) if len(c_uid) else np.array([], dtype=bool)
    valid_to = pd.Series(nxt).where(~last_of_user, pd.NaT)
    return pd.DataFrame(
        {
            "user_id": c_uid,
            "version": ver,
            "event_type": typ[change],
            "valid_from": c_from,
            "valid_to": valid_to.to_numpy(),
        }
    )


def user_type_scd2(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension TYPE-2 history build: each user's event
    stream is an attribute feed (the user's "current type"), and the
    output is its versioned validity-interval history — one row per
    VALUE CHANGE with ``[valid_from, valid_to)`` bounds (``valid_to`` NULL
    on the open current version) and a per-user version ordinal. The
    write-side temporal-modeling complement of the as-of join (which READS
    such a history).

    The SCD2 subtlety is no-op-update collapse: consecutive equal values
    do NOT open a new version (a feed replaying the same attribute must
    not grow the history). ONE hash exchange co-locates each user's
    stream; per partition the change scan is a vectorized sort + shift
    ((ts, event_id) tie order so both engines resolve equal timestamps
    identically), versions are a cumsum over change starts, and
    ``valid_to`` is the NEXT change's ``valid_from`` within the same user
    (shift(-1)) — no second exchange, since user streams are whole per
    partition. Output is change-row-sized, bounded by the feed's true
    change count, not its update count.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    out = to_pandas_with_schema(hash_partition_apply(ds, "user_id", _scd2_intervals_part))
    out = out.sort_values(["user_id", "version"]).reset_index(drop=True)
    out["version"] = out["version"].astype("int64")
    out["valid_from"] = out["valid_from"].astype("datetime64[us]")
    out["valid_to"] = out["valid_to"].astype("datetime64[us]")
    return out


def orders_scd2_enrich(sf_dir: str) -> pd.DataFrame:
    """POINT-IN-TIME enrichment of an independent fact stream against a
    derived SCD2 dimension: every order is decorated with the customer's
    event-type version VALID AT ``o_orderdate`` — the feature-store
    correctness primitive (training labels must see the feature value as
    of the event, never a later one; a plain latest-value join silently
    leaks the future). Orders before a customer's first version, or for
    customers with no history, carry NULLs.

    Physical plan: the dimension is built distributedly (ONE hash
    exchange of the event feed, the shared ``_scd2_intervals_part`` change
    scan), then ONE co-partitioning exchange lands each customer's
    version history and orders in the same partition, where a single
    ``merge_asof`` (backward, by customer) resolves every order — because
    SCD2 validity intervals are contiguous per user, the latest
    ``valid_from <= o_orderdate`` version IS the valid one, so no second
    interval check is needed (zero-length versions self-exclude by the
    (valid_from, version) tie sort, mirroring the oracle's
    ``valid_to``-bounded join). Two bounded exchanges total; no
    broadcast, no driver state.

    ``version`` is nullable → float64-with-NaN to match DuckDB's
    nullable-BIGINT ``.df()`` dtype (values ≪ 2^53, exact)."""
    from xmlschema_ray.ops.relational import (
        copartition_apply,
        hash_partition_apply,
        to_pandas_with_schema,
    )

    events = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    dim = hash_partition_apply(events, "user_id", _scd2_intervals_part)

    # explicit Arrow schema: a block whose valid_to is ALL NaT would
    # otherwise infer Arrow `null` at the copartition normalization and
    # poison the unified schema (timestamp blocks cannot cast to null)
    dim_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("version", pa.int64()),
            ("event_type", pa.string()),
            ("valid_from", pa.timestamp("us")),
            ("valid_to", pa.timestamp("us")),
        ]
    )

    def typed(b: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(b, schema=dim_schema, preserve_index=False)

    dim = dim.map_batches(typed, batch_format="pandas")

    def enrich(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["o_orderkey", "o_custkey", "o_orderdate", "type_at_order", "version"]
        if len(rf) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "o_custkey": pd.Series([], dtype=np.int64),
                    "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                    "type_at_order": pd.Series([], dtype=object),
                    "version": pd.Series([], dtype=np.float64),
                }
            )
        o = rf.sort_values("o_orderdate", kind="mergesort").reset_index(drop=True)
        o["o_orderdate"] = o["o_orderdate"].astype("datetime64[us]")
        if len(lf) == 0:
            m = o.copy()
            m["type_at_order"] = pd.Series([None] * len(m), dtype=object)
            m["version"] = np.nan
            return m[out_cols]
        d = lf.sort_values(["valid_from", "version"], kind="mergesort").reset_index(drop=True)
        d["valid_from"] = d["valid_from"].astype("datetime64[us]")
        m = pd.merge_asof(
            o,
            d[["user_id", "version", "event_type", "valid_from"]],
            left_on="o_orderdate",
            right_on="valid_from",
            left_by="o_custkey",
            right_by="user_id",
            direction="backward",
        )
        m["type_at_order"] = m["event_type"].astype(object).where(m["event_type"].notna(), None)
        m["version"] = m["version"].astype(np.float64)
        return m[out_cols]

    df = to_pandas_with_schema(
        copartition_apply(dim, orders, "user_id", "o_custkey", enrich)
    )
    df = df.sort_values("o_orderkey").reset_index(drop=True)
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df["version"] = df["version"].astype(np.float64)
    return df


ORDERS_SCD2_ENRICH_SQL = """
WITH chg AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), vers AS (
  SELECT user_id, event_type, ts AS valid_from,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS version
  FROM chg WHERE prev IS NULL OR prev <> event_type
), v2 AS (
  SELECT user_id, event_type, version, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, version)
           AS valid_to
  FROM vers
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       v.event_type AS type_at_order,
       CAST(v.version AS BIGINT) AS version
FROM orders o
LEFT JOIN v2 v
  ON v.user_id = o.o_custkey AND v.valid_from <= o.o_orderdate
 AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
ORDER BY o.o_orderkey
"""


def time_weighted_value_by_user(sf_dir: str) -> pd.DataFrame:
    """TIME-WEIGHTED average of ``value`` per user — each reading weighted
    by how long it was current (until the user's next event), the TSDB /
    metering primitive a plain AVG gets wrong whenever sampling is uneven
    (a value held for a week must outweigh one held for a second).

    Exactness: values scale to integer cents (``common.cents``) and
    weights are integer MICROSECOND durations, so the weighted sum is one
    order-independent int64 reduction and ``twa_value`` is a single
    final IEEE division — bit-exact vs the oracle at any parallelism
    (float value × float seconds would diverge on summation order).
    Overflow is linted per user (max|cents| × span < 2^62), not assumed.

    ONE hash exchange co-locates user streams ((ts, event_id) tie order);
    durations are a vectorized shift inside the partition; per-user sums
    are a C-speed groupby — output is user-dimension-sized. Users whose
    span is zero (single event, or all events on one timestamp) carry no
    time weight and are excluded by an INTEGER predicate, never a float
    compare.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def twa_part(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = p["user_id"].to_numpy(np.int64)
        t = p["ts"].to_numpy("datetime64[us]").astype(np.int64)
        c = cents(p["value"].to_numpy())
        same_next = np.zeros(len(p), dtype=bool)
        if len(p) > 1:
            same_next[:-1] = uid[1:] == uid[:-1]
        dt = np.zeros(len(p), dtype=np.int64)
        dt[same_next] = (np.roll(t, -1) - t)[same_next]
        g = pd.DataFrame({"user_id": uid, "w": c * dt, "t": t, "c_abs": np.abs(c)})
        agg = g.groupby("user_id", as_index=False).agg(
            s=("w", "sum"),
            t_min=("t", "min"),
            t_max=("t", "max"),
            n_events=("w", "size"),
            c_max=("c_abs", "max"),
        )
        span = agg["t_max"].to_numpy(np.int64) - agg["t_min"].to_numpy(np.int64)
        if len(agg) and int((agg["c_max"].to_numpy(np.int64) * span).max()) > (1 << 62):
            raise ValueError(
                "time_weighted_value_by_user: |cents|·span exceeds 2^62 for some "
                "user; rescale values or shard the time range"
            )
        agg["span_us"] = span
        return agg[["user_id", "s", "span_us", "n_events"]]

    out = to_pandas_with_schema(hash_partition_apply(ds, "user_id", twa_part))
    out = out[out["span_us"] > 0].copy()
    out["twa_value"] = out["s"].to_numpy(np.int64).astype(np.float64) / out[
        "span_us"
    ].to_numpy(np.int64).astype(np.float64)
    out = out.sort_values("user_id").reset_index(drop=True)
    out = out.astype({"user_id": "int64", "span_us": "int64", "n_events": "int64"})
    return out[["user_id", "n_events", "span_us", "twa_value"]]


TIME_WEIGHTED_VALUE_SQL = """
WITH o AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), d AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us,
         CAST(SUM(CASE WHEN nxt IS NOT NULL
                       THEN c * (epoch_us(nxt) - epoch_us(ts)) ELSE 0 END) AS BIGINT) AS s
  FROM o GROUP BY user_id
)
SELECT user_id, n_events, span_us,
       CAST(s AS DOUBLE) / CAST(span_us AS DOUBLE) AS twa_value
FROM d WHERE span_us > 0 ORDER BY user_id
"""


USER_TYPE_SCD2_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
  FROM events
), c AS (
  SELECT user_id, event_type, ts AS valid_from,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
  FROM o WHERE prev_t IS NULL OR prev_t <> event_type
)
SELECT user_id, version, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
FROM c ORDER BY user_id, version
"""


EVENT_TRANSITION_SQL = """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), c AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM c ORDER BY prev_type, event_type
"""


ORDERS_SNAPSHOT_DIFF_SQL = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders
), b AS (
  SELECT k, CASE WHEN k % 89 = 0 THEN v + 1 ELSE v END AS v FROM a WHERE k % 97 <> 0
  UNION ALL
  SELECT k + 1000000000 AS k, v FROM a WHERE k % 101 = 0
)
SELECT COALESCE(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.v <> b.v
ORDER BY o_orderkey
"""


def _levenshtein(a: str, b: str) -> int:
    """Plain unit-cost edit distance (insert/delete/substitute, no
    transposition) — must match DuckDB's ``levenshtein`` exactly; strings
    here are short names, so the full DP is the honest kernel."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _deletion_neighborhood(s: str, k: int) -> set:
    """All strings reachable by deleting ≤ k characters (SymSpell keys)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def similar_part_names(sf_dir: str, max_dist: int = 2) -> pd.DataFrame:
    """Fuzzy string SELF-JOIN (record linkage / entity resolution): all
    distinct part-name pairs within Levenshtein ``max_dist``, found EXACTLY
    via SymSpell deletion-neighborhood blocking (Garbe's algorithm): if
    ``edit(a, b) ≤ k`` then deleting ≤ k chars from each side yields a
    SHARED variant — every true pair provably shares a blocking key (the
    guarantee q-gram blocking lacks on short strings), and false positives
    die in the exact verify. The approximate-join operator class the
    LSH/banding family can't express (edit distance, not set overlap).

    Scale shape: the name VOCABULARY flows, never the part fact table —
    per-batch distinct partials → one combiner dedupe; each name explodes
    to O(len^k) deletion keys through ONE key-hashed exchange; candidate
    pairs and the Levenshtein verify are candidate-bounded (pair-keyed
    dedupe exchange, the minhash shape).
    """
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "part"), columns=["p_name"])
    names = hash_partition_apply(
        ds.map_batches(lambda b: b.drop_duplicates(), batch_format="pandas"),
        "p_name",
        lambda g: g.drop_duplicates(),
    )

    def key_rows(b: pd.DataFrame) -> pd.DataFrame:
        ks, ns = [], []
        for name in b["p_name"]:
            for d in _deletion_neighborhood(name, max_dist):
                ks.append(d)
                ns.append(name)
        return pd.DataFrame(
            {"key": pd.Series(ks, dtype=object), "name": pd.Series(ns, dtype=object)}
        )

    keyed = names.map_batches(key_rows, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, grp in g.groupby("key", sort=False)["name"]:
            u = np.unique(grp.to_numpy())
            if len(u) >= 2:
                ia, ib = np.triu_indices(len(u), k=1)
                outs_a.append(u[ia])
                outs_b.append(u[ib])
        if not outs_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
        ).drop_duplicates()

    cand = hash_partition_apply(keyed, "key", bucket_pairs)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        ka, kb, dist = [], [], []
        for a, b in zip(g["a"], g["b"]):
            d = _levenshtein(a, b)
            if d <= max_dist:
                ka.append(a)
                kb.append(b)
                dist.append(d)
        return pd.DataFrame(
            {
                "name_a": pd.Series(ka, dtype=object),
                "name_b": pd.Series(kb, dtype=object),
                "dist": pd.Series(dist, dtype="int64"),
            }
        )

    out = to_pandas_with_schema(hash_partition_apply(cand, ["a", "b"], verify))
    if not len(out):
        return pd.DataFrame(
            {
                "name_a": pd.Series([], dtype=object),
                "name_b": pd.Series([], dtype=object),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


def fd_repair_by_source(sf_dir: str) -> pd.DataFrame:
    """Approximate FUNCTIONAL-DEPENDENCY profiling: how far the corpus is
    from satisfying ``source → lang`` — per source, the number of distinct
    langs, the majority lang (ties to the lexicographically smallest, so
    both engines agree), and the MINIMAL repair count (docs that would
    have to change lang for the FD to hold). The schema-discovery
    primitive behind "should lang be a keyed attribute of source?" —
    g3-style approximate-FD error (Kivinen & Mannila 1995) made exact.

    One (source, lang) count combiner exchange (group-cardinality rows,
    never docs); the per-source argmax/top is driver-side over the
    |sources|×|langs|-bounded count table.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "documents"), columns=["source", "lang"])
    counts = to_pandas_with_schema(
        combiner_aggregate(ds, ["source", "lang"], {"n": (None, "count")})
    )
    counts["n"] = counts["n"].astype("int64")
    # majority with smallest-lang tie: sort (n desc, lang asc), take first
    c = counts.sort_values(["source", "n", "lang"], ascending=[True, False, True])
    g = c.groupby("source", as_index=False)
    head = g.first().rename(columns={"lang": "majority_lang", "n": "n_majority"})
    tot = counts.groupby("source", as_index=False).agg(
        n_docs=("n", "sum"), n_langs=("n", "size")
    )
    out = tot.merge(head[["source", "majority_lang", "n_majority"]], on="source")
    out["n_repair"] = out["n_docs"] - out["n_majority"]
    out = out[["source", "n_langs", "n_docs", "majority_lang", "n_repair"]]
    return (
        out.sort_values("source")
        .reset_index(drop=True)
        .astype({"n_langs": "int64", "n_docs": "int64", "n_repair": "int64"})
    )


FD_REPAIR_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), m AS (
  SELECT source, lang AS majority_lang, n AS n_majority,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rk
  FROM c
), t AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM c GROUP BY 1
)
SELECT t.source, t.n_langs, t.n_docs, m.majority_lang,
       CAST(t.n_docs - m.n_majority AS BIGINT) AS n_repair
FROM t JOIN m ON t.source = m.source AND m.rk = 1
ORDER BY t.source
"""


def key_skew_report(sf_dir: str) -> pd.DataFrame:
    """Key-distribution skew diagnostics for shuffle-heavy columns — the
    question every wide plan in this repo starts from (salt? consolidate?
    broadcast?): per audited column, row count, distinct-key count, the
    hottest key's row count, and the Gini coefficient of the key
    distribution (0 = uniform, →1 = one key owns everything).

    Composition of two existing primitives, integer-exact end to end:
    per-key counts via ONE combiner exchange (key-cardinality partials),
    then :func:`ops.global_rank` orders the COUNT TABLE (never the fact
    table) by (count, key) — sampled range boundaries, metadata-sized
    driver state — and per-batch integer partials reduce Σc, Σ(rank·c),
    max c. Gini is one closed-form float expression over those integer
    sums, evaluated in the oracle's exact operation order. (Σ rank·c can
    exceed int64 near 10^12 rows × 10^9 keys — promote the partial to
    Python ints there; exact at every tested scale here.)
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, global_rank

    specs = [("lineitem", "l_partkey"), ("orders", "o_custkey"), ("documents", "source")]
    rows = []
    for table, col in specs:
        ds = rd.read_parquet(table_path(sf_dir, table), columns=[col])
        counts = combiner_aggregate(
            ds.map_batches(
                lambda b, c=col: b.rename(columns={c: "key"}), batch_format="pandas"
            ),
            "key",
            {"n": (None, "count")},
        )
        ranked, k = global_rank(counts, ["n", "key"], rank_col="r")

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            n = b["n"].to_numpy(np.int64)
            r = b["r"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "s_c": pd.array([int(n.sum())], dtype="int64"),
                    "s_rc": pd.array([int((r * n).sum())], dtype="int64"),
                    "top1": pd.array([int(n.max()) if len(n) else 0], dtype="int64"),
                }
            )

        p = ranked.map_batches(partial, batch_format="pandas").to_pandas()
        s_c, s_rc = int(p["s_c"].sum()), int(p["s_rc"].sum())
        top1 = int(p["top1"].max())
        gini = 2.0 * s_rc / (float(k) * float(s_c)) - float(k + 1) / float(k)
        rows.append((f"{table}.{col}", s_c, k, top1, gini))
    out = pd.DataFrame(
        rows, columns=["table_col", "n_rows", "n_distinct", "top1_n", "gini"]
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["top1_n"] = out["top1_n"].astype("int64")
    return out.sort_values("table_col").reset_index(drop=True)


def extendedprice_deciles(sf_dir: str) -> pd.DataFrame:
    """EXACT global deciles of a fact-sized column (order statistics
    without a global sort and without a driver-side sort): the
    ``global_rank`` range-partitioning machinery assigns every row its
    exact 1-based rank; the nine target ranks ``(n-1)·k//10 + 1`` are then
    a streamed membership filter — nine rows reach the driver. Ties are
    broken by a unique key for the total order, but the VALUE at a given
    rank is tie-order-invariant, so the result matches any engine's
    row_number-over-value selection exactly. The exact counterpart of the
    engine's mergeable-histogram quantile sketches (``engine/stats.py``)
    for when approximate bounds are not enough.
    """
    from xmlschema_ray.ops.relational import global_rank

    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_orderkey", "l_linenumber"],
    )
    ranked, n = global_rank(
        ds, ["l_extendedprice", "l_orderkey", "l_linenumber"], rank_col="rn"
    )
    targets = {((n - 1) * k) // 10 + 1: k for k in range(1, 10)}
    tgt = set(targets)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        hit = b[b["rn"].isin(tgt)]
        return hit[["rn", "l_extendedprice"]].reset_index(drop=True)

    rows = ranked.map_batches(pick, batch_format="pandas").to_pandas()
    out = pd.DataFrame(
        {
            "decile": pd.array(
                [targets[int(r)] for r in rows["rn"]], dtype="int64"
            ),
            "value": rows["l_extendedprice"].to_numpy(np.float64),
        }
    )
    return out.sort_values("decile").reset_index(drop=True)


def join_size_bounds(sf_dir: str) -> pd.DataFrame:
    """Join-cardinality estimation from degree sequences (the
    query-optimizer primitive; lp-norm bounds per Khamis et al., PODS
    2024): the EXACT size of ``orders ⋈ lineitem`` on orderkey plus two
    upper bounds, computed WITHOUT materializing the join —

    * exact: Σₖ d_O(k)·d_L(k) over joining keys;
    * l1·l∞ bound: min(|O|·maxdeg_L, |L|·maxdeg_O);
    * l2 bound (Cauchy-Schwarz): ‖d_O‖₂·‖d_L‖₂.

    Plan: per-table per-key degree tables via one combiner exchange each
    (key-cardinality partials), then ONE co-partitioning exchange of the
    two DEGREE TABLES (never the facts) computes the product-sum AND each
    side's norms in the same pass — per partition one 7-integer row
    reaches the driver. The only float ops are the two final sqrts
    (IEEE-correctly-rounded in both engines on exact integer inputs).
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, copartition_apply

    def degrees(table: str, key: str) -> "rd.Dataset":
        ds = rd.read_parquet(table_path(sf_dir, table), columns=[key])
        return combiner_aggregate(
            ds.map_batches(
                lambda b, k=key: b.rename(columns={k: "k"}), batch_format="pandas"
            ),
            "k",
            {"d": (None, "count")},
        )

    d_o = degrees("orders", "o_orderkey")
    d_l = degrees("lineitem", "l_orderkey").map_batches(
        lambda b: b.rename(columns={"d": "d_r"}), batch_format="pandas"
    )

    def per_part(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(rf, on="k", how="inner")
        da = lf["d"].to_numpy(np.int64)
        db = rf["d_r"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "prod": pd.array(
                    [int((m["d"].to_numpy(np.int64) * m["d_r"].to_numpy(np.int64)).sum())],
                    dtype="int64",
                ),
                "l1_a": pd.array([int(da.sum())], dtype="int64"),
                "linf_a": pd.array([int(da.max()) if len(da) else 0], dtype="int64"),
                "l2sq_a": pd.array([int((da * da).sum())], dtype="int64"),
                "l1_b": pd.array([int(db.sum())], dtype="int64"),
                "linf_b": pd.array([int(db.max()) if len(db) else 0], dtype="int64"),
                "l2sq_b": pd.array([int((db * db).sum())], dtype="int64"),
            }
        )

    p = copartition_apply(d_o, d_l, "k", "k", per_part).to_pandas()
    exact = int(p["prod"].sum())
    l1_a, l1_b = int(p["l1_a"].sum()), int(p["l1_b"].sum())
    linf_a, linf_b = int(p["linf_a"].max()), int(p["linf_b"].max())
    l2 = float(np.sqrt(float(int(p["l2sq_a"].sum())))) * float(
        np.sqrt(float(int(p["l2sq_b"].sum())))
    )
    return pd.DataFrame(
        {
            "exact_join_size": pd.array([exact], dtype="int64"),
            "bound_l1_linf": pd.array(
                [min(l1_a * linf_b, l1_b * linf_a)], dtype="int64"
            ),
            "bound_l2": [l2],
        }
    )


JOIN_SIZE_BOUNDS_SQL = """
WITH do_ AS (SELECT o_orderkey AS k, COUNT(*) AS d FROM orders GROUP BY 1),
dl AS (SELECT l_orderkey AS k, COUNT(*) AS d FROM lineitem GROUP BY 1),
j AS (SELECT COALESCE(SUM(do_.d * dl.d), 0) AS exact_size FROM do_ JOIN dl USING (k)),
na AS (SELECT SUM(d) AS l1, MAX(d) AS linf, SUM(d * d) AS l2sq FROM do_),
nb AS (SELECT SUM(d) AS l1, MAX(d) AS linf, SUM(d * d) AS l2sq FROM dl)
SELECT CAST(j.exact_size AS BIGINT) AS exact_join_size,
       CAST(LEAST(na.l1 * nb.linf, nb.l1 * na.linf) AS BIGINT) AS bound_l1_linf,
       sqrt(CAST(na.l2sq AS DOUBLE)) * sqrt(CAST(nb.l2sq AS DOUBLE)) AS bound_l2
FROM j, na, nb
"""


EXTENDEDPRICE_DECILES_SQL = """
WITH r AS (
  SELECT l_extendedprice AS v,
         row_number() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem
), n AS (SELECT COUNT(*) AS c FROM lineitem),
t AS (
  SELECT k, ((c - 1) * k) // 10 + 1 AS rn
  FROM n, LATERAL unnest(generate_series(1, 9)) AS g(k)
)
SELECT CAST(t.k AS BIGINT) AS decile, r.v AS value
FROM t JOIN r ON r.rn = t.rn
ORDER BY decile
"""


def _skew_sql_for(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS table_col, CAST(s_c AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_distinct, CAST(top1 AS BIGINT) AS top1_n,
       2.0 * CAST(s_rc AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(s_c AS DOUBLE))
         - CAST(k + 1 AS DOUBLE) / CAST(k AS DOUBLE) AS gini
FROM (
  SELECT SUM(n) AS s_c, SUM(r * n) AS s_rc, MAX(n) AS top1, COUNT(*) AS k
  FROM (
    SELECT n, row_number() OVER (ORDER BY n, key) AS r
    FROM (SELECT {col} AS key, COUNT(*) AS n FROM {table} GROUP BY 1)
  )
)
"""


KEY_SKEW_SQL = (
    _skew_sql_for("lineitem", "l_partkey")
    + " UNION ALL "
    + _skew_sql_for("orders", "o_custkey")
    + " UNION ALL "
    + _skew_sql_for("documents", "source")
    + " ORDER BY table_col"
)


SIMILAR_PART_NAMES_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
ORDER BY name_a, name_b
"""


# -- grouped MODE (most-frequent value per key) ------------------------------


def grouped_mode(
    ds: "rd.Dataset",
    key: str,
    value: str,
    out_value: str = "mode_value",
    out_count: str = "n",
) -> "rd.Dataset":
    """Exact per-key MODE with a deterministic tie-break (highest count,
    then smallest value) — the categorical summary statistic the mean/
    median family can't express.

    Plan: one :func:`combiner_aggregate` pass counts (key, value) pairs —
    per-batch partials bound a hot pair's traffic by #batches, so the
    exchange ships pair-cardinality rows, never fact rows — then ONE
    co-locating exchange on ``key`` alone picks each key's argmax with a
    vectorized stable sort + ``drop_duplicates``. Driver state: none.
    At 10^12 rows the cost is the pair cardinality (categorical values ⇒
    bounded multiple of key count), the same contract as the pivot family.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply

    counts = combiner_aggregate(ds, [key, value], {out_count: (None, "count")})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, out_count, value], ascending=[True, False, True], kind="mergesort"
        )
        out = g.drop_duplicates(key, keep="first")
        return out.rename(columns={value: out_value})[[key, out_value, out_count]]

    return hash_partition_apply(counts, key, pick)


def mode_priority_by_customer(sf_dir: str) -> "rd.Dataset":
    """Each customer's most frequent order priority (ties → smallest
    priority string) — :func:`grouped_mode` over a fact-sized key space."""
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )
    out = grouped_mode(
        orders, "o_custkey", "o_orderpriority", out_value="mode_priority"
    )
    return out.sort("o_custkey")


MODE_PRIORITY_SQL = """
WITH c AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority
  ) AS rk FROM c
)
SELECT o_custkey, o_orderpriority AS mode_priority, n
FROM r WHERE rk = 1 ORDER BY o_custkey
"""


# -- weighted sampling over a join (no join materialization) -----------------


def join_sample_orders_lineitem(sf_dir: str, k: int = 200) -> pd.DataFrame:
    """Uniform ``k``-sample of the orders⋈lineitem JOIN OUTPUT without
    materializing the join (the streaming-sampling-over-joins shape, EDBT
    2023 family): each orders row is weighted by its lineitem DEGREE, a
    weighted without-replacement sample picks the orders side, and each
    sampled row draws ONE of its matching lineitem rows — every join row
    equally likely, but only ``k`` join rows are ever constructed.

    Plan: a per-key degree combiner over lineitem; ONE co-partitioning
    exchange attaches degrees to orders rows (deg-0 rows can't appear in
    the join and drop); the Duffield–Lund–Thorup priority key
    ``h52 / deg`` rides the repo's mergeable bottom-k (`ops.topk` — k ×
    #batches rows reach the reduce at any corpus size); the k winners'
    line picks ``h52b % deg`` resolve through a broadcast semi-filter of
    lineitem (≤ k × max-lines candidate rows collected, never the fact).
    Exactness: both md5 draws and the single IEEE division follow the
    ``weighted_sample_docs`` bit-exact convention, so DuckDB replays the
    cut and the picks verbatim.
    """
    from xmlschema_ray.ops.relational import (
        copartition_apply,
        semi_join,
        to_pandas_with_schema,
        topk,
    )
    from xmlschema_ray.pipelines.curation import _md5_hex

    deg = combiner_aggregate(
        rd.read_parquet(table_path(sf_dir, "lineitem"), columns=["l_orderkey"]),
        "l_orderkey",
        {"d": (None, "count")},
    )
    orders = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def attach(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(rf, left_on="o_orderkey", right_on="l_orderkey", how="inner")
        if not len(m):
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_custkey": pd.Series([], dtype="int64"),
                    "totalprice_cents": pd.Series([], dtype="int64"),
                    "d": pd.Series([], dtype="int64"),
                    "priority": pd.Series([], dtype="float64"),
                    "j": pd.Series([], dtype="int64"),
                }
            )
        ok = m["o_orderkey"].to_numpy(np.int64)
        ck = m["o_custkey"].to_numpy(np.int64)
        tc = cents(m["o_totalprice"].to_numpy())
        d = m["d"].to_numpy(np.int64)
        ident = pd.Series(
            [f"{a}:{b}:{c}" for a, b, c in zip(ok, ck, tc)], dtype=object
        )
        h52 = np.fromiter(
            (int(h[:13], 16) for h in _md5_hex(ident)), dtype=np.int64, count=len(m)
        )
        h52b = np.fromiter(
            (int(h[:13], 16) for h in _md5_hex("L" + ident)),
            dtype=np.int64,
            count=len(m),
        )
        return pd.DataFrame(
            {
                "o_orderkey": ok,
                "o_custkey": ck,
                "totalprice_cents": tc,
                "d": d,
                "priority": h52.astype(np.float64) / d.astype(np.float64),
                "j": h52b % d,
            }
        )

    keyed = copartition_apply(orders, deg, "o_orderkey", "l_orderkey", attach)
    samp = to_pandas_with_schema(
        topk(
            keyed,
            "priority",
            k,
            descending=False,
            tiebreak=["o_orderkey", "o_custkey", "totalprice_cents"],
        )
    )

    li = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    cand = semi_join(li, samp[["o_orderkey"]], "l_orderkey", key="o_orderkey").to_pandas()
    cand["qty_c"] = cents(cand["l_quantity"].to_numpy())
    cand = cand.sort_values(
        ["l_orderkey", "l_linenumber", "qty_c"], kind="mergesort"
    ).reset_index(drop=True)
    cand["r"] = cand.groupby("l_orderkey", sort=False).cumcount()

    out = samp.merge(
        cand[["l_orderkey", "l_linenumber", "qty_c", "r"]],
        left_on=["o_orderkey", "j"],
        right_on=["l_orderkey", "r"],
        how="inner",
    )
    out = out.sort_values(
        ["priority", "o_orderkey", "o_custkey", "totalprice_cents"], kind="mergesort"
    ).reset_index(drop=True)
    return out[
        ["o_orderkey", "o_custkey", "totalprice_cents", "priority", "l_linenumber", "qty_c"]
    ]


JOIN_SAMPLE_SQL = """
WITH deg AS (
  SELECT l_orderkey AS dk, CAST(COUNT(*) AS BIGINT) AS d FROM lineitem GROUP BY 1
), o AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents, g.d,
         CAST(o.o_orderkey AS VARCHAR) || ':' || CAST(o.o_custkey AS VARCHAR) || ':' ||
           CAST(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR) AS ident
  FROM orders o JOIN deg g ON o.o_orderkey = g.dk
), h AS (
  SELECT *,
         CAST(('0x' || substring(md5(ident), 1, 13)) AS BIGINT) AS h52,
         CAST(('0x' || substring(md5('L' || ident), 1, 13)) AS BIGINT) AS h52b
  FROM o
), samp AS (
  SELECT o_orderkey, o_custkey, totalprice_cents, d,
         CAST(h52 AS DOUBLE) / CAST(d AS DOUBLE) AS priority,
         h52b % d AS j
  FROM h
  ORDER BY priority, o_orderkey, o_custkey, totalprice_cents
  LIMIT 200
), ranked AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
         ) - 1 AS r
  FROM lineitem
)
SELECT s.o_orderkey, s.o_custkey, s.totalprice_cents, s.priority, r.l_linenumber, r.qty_c
FROM samp s JOIN ranked r ON r.l_orderkey = s.o_orderkey AND r.r = s.j
ORDER BY s.priority, s.o_orderkey, s.o_custkey, s.totalprice_cents
"""


# -- inclusion-dependency discovery (FK mining) -------------------------------


def ind_discovery(sf_dir: str) -> pd.DataFrame:
    """INCLUSION-DEPENDENCY discovery: for each candidate cross-table pair
    ``dependent ⊆ referenced``, count the dependent side's distinct values
    that never appear on the referenced side — the FK-MINING profiling
    step (the Spider/BINDER family restricted to declared candidates,
    which is how production profilers run it at fact scale). The sibling
    of :func:`fd_discovery`: FDs feed repair, INDs feed ``ForeignKey``
    constraints — a candidate with ``n_missing = 0`` is safe to declare,
    and a nonzero count sizes the orphan cleanup.

    Per candidate: one :func:`~xmlschema_ray.ops.relational.except_keys`
    pass (both raw single-column projections reduce to per-batch distinct
    partials inside the combiner, so the one exchange ships key-space
    data, never fact rows — the referenced side is never broadcast) plus
    a distinct-count combiner; the report folds result-sized counts only.
    """
    from xmlschema_ray.ops.relational import except_keys

    candidates = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
        # the reverse direction deliberately included: orders with no
        # lineitem rows make it FAIL, exercising the nonzero path
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ]
    rows = []
    for dep_t, dep_c, ref_t, ref_c in candidates:
        dep = rd.read_parquet(table_path(sf_dir, dep_t), columns=[dep_c])
        ref = rd.read_parquet(table_path(sf_dir, ref_t), columns=[ref_c])
        dep_distinct = combiner_aggregate(dep, dep_c, {"c": (None, "count")})
        n_dep = int(dep_distinct.count())
        n_missing = int(except_keys(dep, ref, dep_c, ref_c).count())
        rows.append(
            (f"{dep_t}.{dep_c}<={ref_t}.{ref_c}", n_dep, n_missing, int(n_missing == 0))
        )
    return (
        pd.DataFrame(rows, columns=["ind", "n_dep_distinct", "n_missing", "holds"])
        .astype({"n_dep_distinct": "int64", "n_missing": "int64", "holds": "int64"})
        .sort_values("ind")
        .reset_index(drop=True)
    )


def _ind_sql_one(dep_t: str, dep_c: str, ref_t: str, ref_c: str) -> str:
    return f"""
SELECT '{dep_t}.{dep_c}<={ref_t}.{ref_c}' AS ind,
       CAST((SELECT COUNT(DISTINCT {dep_c}) FROM {dep_t}) AS BIGINT) AS n_dep_distinct,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {dep_c} AS v FROM {dep_t}) d
             LEFT JOIN (SELECT DISTINCT {ref_c} AS v FROM {ref_t}) r ON d.v = r.v
             WHERE r.v IS NULL) AS BIGINT) AS n_missing,
       CAST(CASE WHEN (SELECT COUNT(*) FROM (SELECT DISTINCT {dep_c} AS v FROM {dep_t}) d
             LEFT JOIN (SELECT DISTINCT {ref_c} AS v FROM {ref_t}) r ON d.v = r.v
             WHERE r.v IS NULL) = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
"""


IND_DISCOVERY_SQL = (
    "\nUNION ALL\n".join(
        _ind_sql_one(*c)
        for c in [
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("events", "user_id", "customer", "c_custkey"),
            ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ]
    )
    + "ORDER BY ind"
)


# -- schema-evolution union (data-lake generations) --------------------------


def evolved_union_orders(sf_dir: str) -> "rd.Dataset":
    """Read a two-GENERATION orders layout through
    :func:`xmlschema_ray.sources.readers.union_with_evolution` — gen1
    (even order keys) predates the ``o_orderpriority`` column and stores
    ``o_custkey`` narrow (int32); gen2 (odd keys) has the full schema.
    The unified stream fills gen1's missing priority with typed nulls and
    widens its custkey exactly, so a consumer sees ONE canonical schema.

    The generations are derived deterministically from ``orders`` and
    cached under /tmp (build-then-rename, the layout-cache idiom), which
    lets the DuckDB oracle replay the union as a CASE over the parity
    split. Zero exchanges end to end except the canonical result sort.
    """
    import os
    import shutil

    from xmlschema_ray.sources.readers import union_with_evolution

    root = os.path.join(
        "/tmp/xmlschema_ray_evolved", os.path.basename(os.path.normpath(sf_dir))
    )
    g1, g2 = os.path.join(root, "gen1"), os.path.join(root, "gen2")
    if not (os.path.isdir(g1) and os.path.isdir(g2)):
        orders = rd.read_parquet(
            table_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
        )

        def gen1_rows(batch: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(batch["o_orderkey"], 1), 0)
            b = batch.filter(keep)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_custkey": b["o_custkey"].cast(pa.int32()),
                    "o_totalprice": b["o_totalprice"],
                }
            )

        def gen2_rows(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(pc.bit_wise_and(batch["o_orderkey"], 1), 1))

        tmp = f"{root}.build{os.getpid()}"

        # a crashed same-pid build leaves stale parquet the layout

        # writers now refuse — clear it before building

        import shutil as _sh


        _sh.rmtree(tmp, ignore_errors=True)
        orders.map_batches(gen1_rows, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "gen1")
        )
        orders.map_batches(gen2_rows, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "gen2")
        )
        try:
            os.rename(tmp, root)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    canonical = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("o_orderpriority", pa.string()),
        ]
    )
    u = union_with_evolution(
        [rd.read_parquet(g1), rd.read_parquet(g2)], canonical
    )

    def shape(batch: pa.Table) -> pa.Table:
        c = pa.chunked_array(
            [
                np.floor(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                ).astype(np.int64)
            ]
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "totalprice_cents": c,
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    return u.map_batches(shape, batch_format="pyarrow").sort(
        ["o_orderkey", "o_custkey"]
    )


EVOLVED_UNION_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
FROM orders
ORDER BY o_orderkey, o_custkey
"""


# -- wide→long reshape (UNPIVOT) --------------------------------------------


def melt_lineitem_measures(sf_dir: str, min_quantity: float = 48.0) -> "rd.Dataset":
    """UNPIVOT the three lineitem money measures into tidy long form —
    the inverse reshape of the pivot/rollup family, via
    :func:`xmlschema_ray.ops.transform.melt_dataset` (zero exchanges;
    3× row expansion inside each batch).

    Measures are scaled to integer 1e-4 units BEFORE the melt so the long
    ``value_e4`` column is one exact int64 type (``melt_dataset`` refuses
    mixed types rather than silently promoting) and the oracle's UNION ALL
    replays it bit-for-bit. ``min_quantity`` bounds the output at toy
    scale; at 100 TB the melt itself streams (row-local) and the bound is
    the writer's problem, not the reshape's.
    """
    from xmlschema_ray.ops.transform import melt_dataset

    measures = ["l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(
        table_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"] + measures,
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_quantity"] >= min_quantity]
        out = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(),
                "l_linenumber": batch["l_linenumber"].to_numpy(),
            }
        )
        for m in measures:
            out[m] = scaled_int(batch[m].to_numpy(), 10000.0)
        return out

    wide = ds.map_batches(prep, batch_format="pandas")
    long = melt_dataset(
        wide,
        ["l_orderkey", "l_linenumber"],
        measures,
        var_name="measure",
        value_name="value_e4",
    )
    return long.sort(["l_orderkey", "l_linenumber", "measure"])


MELT_LINEITEM_SQL = """
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_quantity >= 48.0
)
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure,
       CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS value_e4 FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) FROM src
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) FROM src
ORDER BY l_orderkey, l_linenumber, measure
"""


ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "melt_lineitem_measures": MELT_LINEITEM_SQL,
    "mode_priority_by_customer": MODE_PRIORITY_SQL,
    "evolved_union_orders": EVOLVED_UNION_SQL,
    "ind_discovery": IND_DISCOVERY_SQL,
    "join_sample_orders_lineitem": JOIN_SAMPLE_SQL,
    "similar_part_names": SIMILAR_PART_NAMES_SQL,
    "key_skew_report": KEY_SKEW_SQL,
    "extendedprice_deciles": EXTENDEDPRICE_DECILES_SQL,
    "join_size_bounds": JOIN_SIZE_BOUNDS_SQL,
    "debounce_events": DEBOUNCE_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "part_pair_cooccurrence": PART_PAIR_SQL,
    "association_rules_parts": ASSOCIATION_RULES_SQL,
    "fd_discovery": FD_DISCOVERY_SQL,
    "part_triangle_count": TRIANGLE_SQL,
    "user_path_counts": USER_PATHS_SQL,
    "zorder_tile_stats": ZORDER_TILE_SQL,
    "orders_priority_counts": ORDERS_PRIORITY_SQL,
    "union_entity_keys": UNION_SQL,
    "customers_without_recent_orders": CUSTOMERS_WITHOUT_RECENT_SQL,
    "orders_above_customer_avg": ORDERS_ABOVE_AVG_SQL,
    "median_quantity_by_flag": MEDIAN_QUANTITY_SQL,
    "corr_qty_discount_by_flag": CORR_QTY_DISCOUNT_SQL,
    "regr_price_on_qty_by_flag": REGR_PRICE_QTY_SQL,
    "quantile_sketch_quantity": QUANTILE_SKETCH_SQL,
    "contingency_chi2": CONTINGENCY_CHI2_SQL,
    "late_event_counts": LATE_EVENTS_SQL,
    "events_lag_delta": LAG_DELTA_SQL,
    "events_rolling_value_sum": ROLLING_SUM_SQL,
    "events_rolling_zscore": ROLLING_ZSCORE_SQL,
    "events_rolling_median": ROLLING_MEDIAN_SQL,
    "brand_revenue_skew_join": BRAND_REVENUE_SKEW_SQL,
    "clustered_price_band": CLUSTERED_BAND_SQL,
    "zordered_box_query": ZORDERED_BOX_SQL,
    "orders_scd2_enrich": ORDERS_SCD2_ENRICH_SQL,
    "clustered_merge_revenue": CLUSTERED_MERGE_REVENUE_SQL,
    "bucketed_join_revenue": BUCKETED_JOIN_SQL,
    "orders_pivot_status_priority": PIVOT_SQL,
    "asof_latest_order_before_event": ASOF_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "join_order_lineitem_status": JOIN_STATUS_SQL,
    "urgent_revenue_bloom_join": URGENT_BLOOM_SQL,
    "top10_customers_by_totalprice": TOP10_SQL,
    "filter_project_lineitem": FILTER_PROJECT_SQL,
    "distinct_part_count": DISTINCT_SQL,
    "duplicate_orderkeys": DUP_ORDERKEYS_SQL,
    "top2_orders_per_customer": TOP2_PER_CUSTOMER_SQL,
    "events_daily_window": DAILY_WINDOW_SQL,
    "events_sliding_window": SLIDING_WINDOW_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "session_event_ranks": SESSION_RANKS_SQL,
    "retention_cohorts": RETENTION_SQL,
    "json_extract_events": JSON_EXTRACT_SQL,
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    "orders_cube": ORDERS_CUBE_SQL,
    "first_order_per_customer": FIRST_ORDER_SQL,
    "orders_price_ntile": NTILE_SQL,
    "customers_without_events": CUSTOMERS_WITHOUT_EVENTS_SQL,
    "repeat_orders_within_30d": REPEAT_ORDERS_SQL,
    "orders_snapshot_diff": ORDERS_SNAPSHOT_DIFF_SQL,
    "orders_apply_changes": ORDERS_APPLY_CHANGES_SQL,
    "orders_compact_bucketed": ORDERS_APPLY_CHANGES_SQL,
    "bloom_index_custkey_lookup": BLOOM_INDEX_CUSTKEY_SQL,
    "event_transition_matrix": EVENT_TRANSITION_SQL,
    "user_type_scd2": USER_TYPE_SCD2_SQL,
    "time_weighted_value_by_user": TIME_WEIGHTED_VALUE_SQL,
    "fd_repair_by_source": FD_REPAIR_SQL,
    "orders_status_counts_ivm": ORDERS_STATUS_IVM_SQL,
    "join_ivm_priority_revenue": JOIN_IVM_SQL,
    "weekly_active_users": WEEKLY_ACTIVE_SQL,
    "winsorized_price_by_flag": WINSORIZED_PRICE_SQL,
    "customer_event_counts": CUSTOMER_EVENT_COUNTS_SQL,
}

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "melt_lineitem_measures": melt_lineitem_measures,
    "mode_priority_by_customer": mode_priority_by_customer,
    "evolved_union_orders": evolved_union_orders,
    "ind_discovery": ind_discovery,
    "join_sample_orders_lineitem": join_sample_orders_lineitem,
    "similar_part_names": similar_part_names,
    "key_skew_report": key_skew_report,
    "extendedprice_deciles": extendedprice_deciles,
    "join_size_bounds": join_size_bounds,
    "debounce_events": debounce_events,
    "funnel_conversion": funnel_conversion,
    "part_pair_cooccurrence": part_pair_cooccurrence,
    "association_rules_parts": association_rules_parts,
    "fd_discovery": fd_discovery,
    "part_triangle_count": part_triangle_count,
    "user_path_counts": user_path_counts,
    "zorder_tile_stats": zorder_tile_stats,
    "orders_priority_counts": orders_priority_counts,
    "union_entity_keys": union_entity_keys,
    "customers_without_recent_orders": customers_without_recent_orders,
    "orders_above_customer_avg": orders_above_customer_avg,
    "median_quantity_by_flag": median_quantity_by_flag,
    "corr_qty_discount_by_flag": corr_qty_discount_by_flag,
    "regr_price_on_qty_by_flag": regr_price_on_qty_by_flag,
    "quantile_sketch_quantity": quantile_sketch_quantity,
    "contingency_chi2": contingency_chi2,
    "late_event_counts": late_event_counts,
    "events_lag_delta": events_lag_delta,
    "events_rolling_value_sum": events_rolling_value_sum,
    "events_rolling_zscore": events_rolling_zscore,
    "events_rolling_median": events_rolling_median,
    "brand_revenue_skew_join": brand_revenue_skew_join,
    "clustered_price_band": clustered_price_band,
    "zordered_box_query": zordered_box_query,
    "orders_scd2_enrich": orders_scd2_enrich,
    "clustered_merge_revenue": clustered_merge_revenue,
    "bucketed_join_revenue": bucketed_join_revenue,
    "orders_pivot_status_priority": orders_pivot_status_priority,
    "asof_latest_order_before_event": asof_latest_order_before_event,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "join_order_lineitem_status": join_order_lineitem_status,
    "urgent_revenue_bloom_join": urgent_revenue_bloom_join,
    "top10_customers_by_totalprice": top10_customers_by_totalprice,
    "filter_project_lineitem": filter_project_lineitem,
    "distinct_part_count": distinct_part_count,
    "duplicate_orderkeys": duplicate_orderkeys,
    "top2_orders_per_customer": top2_orders_per_customer,
    "events_daily_window": events_daily_window,
    "events_sliding_window": events_sliding_window,
    "sessionize_events": sessionize_events,
    "session_event_ranks": session_event_ranks,
    "retention_cohorts": retention_cohorts,
    "json_extract_events": json_extract_events,
    "revenue_rollup": revenue_rollup,
    "orders_cube": orders_cube,
    "first_order_per_customer": first_order_per_customer,
    "orders_price_ntile": orders_price_ntile,
    "customers_without_events": customers_without_events,
    "repeat_orders_within_30d": repeat_orders_within_30d,
    "orders_snapshot_diff": orders_snapshot_diff,
    "orders_apply_changes": orders_apply_changes,
    "orders_compact_bucketed": orders_compact_bucketed,
    "bloom_index_custkey_lookup": bloom_index_custkey_lookup,
    "event_transition_matrix": event_transition_matrix,
    "user_type_scd2": user_type_scd2,
    "time_weighted_value_by_user": time_weighted_value_by_user,
    "fd_repair_by_source": fd_repair_by_source,
    "orders_status_counts_ivm": orders_status_counts_ivm,
    "join_ivm_priority_revenue": join_ivm_priority_revenue,
    "weekly_active_users": weekly_active_users,
    "winsorized_price_by_flag": winsorized_price_by_flag,
    "customer_event_counts": customer_event_counts,
}
