"""Analytical operator family: dominance (skyline), sweep-line interval
concurrency, calendar gap-fill, and iterative graph centrality (PageRank).

Four distributed shapes the relational family doesn't cover yet:

* ``pareto_orders`` — the SKYLINE / Pareto-frontier dominance filter:
  per-batch local frontiers are an EXACT pruning (dominated-in-batch ⇒
  dominated-globally), so the only driver-side work is frontier-sized.
* ``peak_concurrent_sessions`` — interval SWEEP-LINE with a two-level
  prefix sum: per-day (total-delta, max-prefix) partials compose under
  day-ordered offsets, so the global running maximum needs no global sort.
* ``events_daily_gapfill`` — a DISTRIBUTED date spine left-joined against
  bounded per-day counts (the zero-fill every reporting pipeline needs).
* ``session_window_overlap`` — two-sided INTERVAL OVERLAP JOIN via
  temporal range replication + max-start ownership dedup (sweep-line
  aggregates points; this pairs intervals with intervals, exactly once).
* ``part_pagerank`` — fixed-iteration PageRank in scaled-INTEGER
  arithmetic, so the result is bit-exact at any parallelism and the
  DuckDB oracle can replay every iteration verbatim (no float summation
  order anywhere).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from xmlschema_ray.pipelines.common import table_path

__all__ = [
    "pareto_orders",
    "peak_concurrent_sessions",
    "session_window_overlap",
    "events_daily_gapfill",
    "part_pagerank",
    "pagerank_from_edges",
    "part_reach_hops",
    "part_kcore",
    "kcore_from_edges",
    "part_sssp",
    "sssp_from_edges",
    "logreg_train_orders",
    "auc_urgent_price",
    "benford_digit_counts",
    "benford_price_audit",
    "k_anonymity_audit",
    "gini_revenue_concentration",
    "seasonal_decompose_daily",
    "hll_sliding_window_users",
    "rolling_value_quantile_sketch",
    "event_activity_islands",
    "bfs_hops_from_edges",
    "QUERIES",
    "ORACLES",
]


# -- skyline ---------------------------------------------------------------


def _skyline_2d(df: pd.DataFrame, time_col: str, value_col: str) -> pd.DataFrame:
    """2-D skyline (minimize ``time_col``, maximize ``value_col``): rows no
    other row dominates (at-least-as-good in both, strictly better in one).
    Ties on both coordinates survive together (neither dominates).

    One mergesort + pure numpy: sorted by (t asc, v desc), a row is on the
    frontier iff its v equals its t-group's max AND strictly exceeds the
    running max of all earlier t-groups.
    """
    if len(df) == 0:
        return df
    p = df.sort_values([time_col, value_col], ascending=[True, False], kind="mergesort")
    t = p[time_col].to_numpy()
    v = p[value_col].to_numpy()
    n = len(p)
    new_t = np.empty(n, dtype=bool)
    new_t[0] = True
    np.not_equal(t[1:], t[:-1], out=new_t[1:])
    start = np.maximum.accumulate(np.where(new_t, np.arange(n), 0))
    group_max = v[start]  # v desc within group -> first row holds the max
    run_max = np.maximum.accumulate(v)
    # run_max[start-1] is the max over ALL strictly-earlier t groups
    # (prefix ends exactly at the previous group's last row)
    prev_max = np.where(start > 0, run_max[np.maximum(start - 1, 0)], -np.inf)
    keep = (v == group_max) & (v > prev_max)
    return p.loc[keep]


def pareto_orders(sf_dir: str) -> pd.DataFrame:
    """SKYLINE query over orders: the Pareto frontier on (earlier
    ``o_orderdate``, higher ``o_totalprice``) — no other order is both at
    least as early AND at least as expensive with one strict. The
    multi-objective "best tradeoff" filter (reference analog: none — this
    is the dominance-constraint member of the §2.9 set-operation family).

    Distribution: the local-frontier-per-batch pass is an EXACT pruning —
    a row dominated inside its batch is dominated globally, and every
    globally undominated row survives its batch — so one embarrassingly
    parallel ``map_batches`` (zero exchanges) reduces the corpus to
    frontier candidates, and the final pass runs over candidate-sized
    data only (frontier size is the RESULT size; expected O(log n) per
    batch for independent dims — result-sized driver work by
    construction, the accepted design for result-shaped finishes).
    """
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def local_frontier(batch: pd.DataFrame) -> pd.DataFrame:
        return _skyline_2d(batch, "o_orderdate", "o_totalprice")

    cand = to_pandas_with_schema(ds.map_batches(local_frontier, batch_format="pandas"))
    out = _skyline_2d(cand, "o_orderdate", "o_totalprice")
    out = out.sort_values("o_orderkey").reset_index(drop=True)
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out[["o_orderkey", "o_orderdate", "o_totalprice"]]


PARETO_ORDERS_SQL = """
WITH pts AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
dm AS (SELECT o_orderdate AS dt, MAX(o_totalprice) AS mx FROM pts GROUP BY 1),
run AS (
  SELECT dt, mx,
         MAX(mx) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mlt
  FROM dm
)
SELECT p.o_orderkey, p.o_orderdate, p.o_totalprice
FROM pts p JOIN run r ON p.o_orderdate = r.dt
WHERE p.o_totalprice = r.mx AND (r.mlt IS NULL OR p.o_totalprice > r.mlt)
ORDER BY p.o_orderkey
"""


# -- sweep-line interval concurrency ----------------------------------------


def peak_concurrent_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Per-day PEAK CONCURRENT SESSIONS: sessions are the gap-based
    intervals of :func:`sessionize_events` (same 30-minute convention);
    concurrency at an instant is the number of sessions covering it; the
    answer is each day's maximum concurrency observed at session-boundary
    instants — the capacity-planning sweep-line every serving/telemetry
    team runs.

    Distribution is a two-level prefix sum, never a global sort:

    1. ONE hash exchange co-locates each user's events; sessions and their
       (start +1, end+1µs −1) boundary deltas are one vectorized pass.
    2. ONE hash exchange co-locates each DAY's deltas; inside a partition
       the per-day pass merges equal timestamps, cumsums, and emits only
       (day, total_delta, max_prefix) — three integers per day.
    3. Day-level partials compose exactly: the driver orders the bounded
       calendar days, prefix-sums the totals into start-of-day offsets,
       and peak(day) = offset + max_prefix. Driver state is
       calendar-day-sized at ANY corpus size (a decade is ~3,700 rows).

    The −1 fires at end+1µs so a session is concurrent through its last
    event (closed interval), matching the SQL replay microsecond-exactly.
    """
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def session_deltas(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = p["user_id"].ne(p["user_id"].shift())
        brk = new_user | (p["ts"].diff() > gap)
        sid = brk.cumsum()  # partition-local session id (users are whole here)
        g = p.groupby(sid.to_numpy())["ts"]
        start = g.min()
        end = g.max() + pd.Timedelta(microseconds=1)
        ts = pd.concat([start, end], ignore_index=True)
        delta = np.concatenate(
            [np.ones(len(start), dtype=np.int64), -np.ones(len(end), dtype=np.int64)]
        )
        out = pd.DataFrame({"ts": ts, "delta": delta})
        out = out.groupby("ts", as_index=False)["delta"].sum()
        out["day"] = out["ts"].dt.normalize()
        return out

    def day_partials(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("ts", as_index=False).agg(delta=("delta", "sum"), day=("day", "first"))
        g = g.sort_values("ts", kind="mergesort")
        g["cum"] = g.groupby("day", sort=False)["delta"].cumsum()
        out = g.groupby("day", as_index=False).agg(
            total=("delta", "sum"), max_cum=("cum", "max")
        )
        return out.astype({"total": "int64", "max_cum": "int64"})

    deltas = hash_partition_apply(ds, "user_id", session_deltas)
    parts = to_pandas_with_schema(hash_partition_apply(deltas, "day", day_partials))
    f = parts.sort_values("day").reset_index(drop=True)
    offset = f["total"].cumsum().shift(fill_value=0)
    return pd.DataFrame(
        {
            "day": f["day"].astype("datetime64[us]"),
            "peak": (offset + f["max_cum"]).astype("int64"),
        }
    )


PEAK_CONCURRENT_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sid AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS s
  FROM lagged
),
sess AS (SELECT user_id, s, MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM sid GROUP BY 1, 2),
deltas AS (
  SELECT start_ts AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT end_ts + INTERVAL 1 MICROSECOND, -1 FROM sess
),
byts AS (SELECT ts, SUM(delta) AS d FROM deltas GROUP BY ts),
run AS (SELECT ts, SUM(d) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS c FROM byts)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, CAST(MAX(c) AS BIGINT) AS peak
FROM run GROUP BY 1 ORDER BY 1
"""


# -- calendar gap-fill -------------------------------------------------------


def events_daily_gapfill(sf_dir: str) -> "rd.Dataset":
    """Zero-filled daily event counts over the full [min-day, max-day]
    calendar span — the date-spine LEFT JOIN every reporting/dashboard
    pipeline needs (days with no events MUST appear with 0, which no
    plain groupby can produce).

    Distribution: per-day counts fold through one combiner exchange to
    calendar-day cardinality (bounded at any corpus size — a decade is
    ~3,700 rows), then the spine itself is generated DISTRIBUTEDLY with
    ``ray.data.range`` over day offsets and each spine task fills from
    the counts via one ``ray.put`` broadcast (metadata-sized, fetched
    lazily once per task, never re-shipped per batch). Returns the spine
    as a day-sorted Dataset.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["ts"])

    def to_day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].dt.normalize()})

    counts = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(to_day, batch_format="pandas"),
            "day",
            {"n_events": (None, "count")},
        )
    )
    if len(counts) == 0:
        raise ValueError("events_daily_gapfill: empty events input")
    # unit-explicit epoch arithmetic: pandas may hold ns or us depending on
    # the upstream block format, so normalize through numpy datetime64[us]
    day_vals = counts["day"].to_numpy().astype("datetime64[us]").astype(np.int64)
    lo_us = np.int64(day_vals.min())
    day_us = np.int64(86_400_000_000)
    n_days = int((day_vals.max() - lo_us) // day_us) + 1
    lut_ref = ray.put(
        dict(
            zip(
                ((day_vals - lo_us) // day_us).tolist(),
                counts["n_events"].astype("int64").tolist(),
            )
        )
    )

    def fill(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        off = batch["id"].to_numpy(np.int64)
        day = (lo_us + off * day_us).astype("datetime64[us]")
        n = pd.Series(off).map(lut).fillna(0).to_numpy(np.int64)
        return pd.DataFrame({"day": day, "n_events": n})

    return rd.range(n_days).map_batches(fill, batch_format="pandas").sort("day")


EVENTS_GAPFILL_SQL = """
WITH b AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS hi
  FROM events
),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
c AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n FROM events GROUP BY 1)
SELECT spine.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM spine LEFT JOIN c USING (day)
ORDER BY spine.day
"""


# -- integer PageRank --------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # rank mass per node; see lint in pagerank_from_edges
_PR_TELEPORT = (3 * _PR_SCALE) // 20  # floor(0.15 * S) — exactly 1.5e11


def pagerank_from_edges(
    edges: "rd.Dataset",
    iterations: int = 5,
    broadcast_nodes_threshold: int = 2_000_000,
    num_partitions: Optional[int] = None,
) -> pd.DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED edge list (columns
    ``part_a``/``part_b``, one row per unordered edge) in scaled-INTEGER
    arithmetic: rank starts at S=10^12 per node and each iteration applies

        rank'(v) = floor(3S/20) + floor(17 · Σ_{u∈N(v)} floor(rank(u)/deg(u)) / 20)

    (damping 0.85 as the exact rational 17/20). Every operation is integer
    and every merge is an integer SUM, so the result is BIT-EXACT at any
    parallelism and any summation order — the DuckDB oracle replays the
    same k unrolled iterations verbatim. Undirected edges mean every node
    has deg ≥ 1 and at least one in-edge: no dangling-mass term.

    Two physical plans, proven identical by a forced-path test:

    * nodes ≤ ``broadcast_nodes_threshold`` (node set = the PART dimension,
      dim-sized by construction): rank/deg live in ONE ``ray.put`` numpy
      broadcast; each iteration is a single pass over the edge Dataset
      emitting per-batch (dst, contrib) partials through one combiner-sum
      exchange — k iterations, k exchanges, edges never reshuffled.
    * above threshold: rank stays a DATASET; each iteration is one
      copartition join of edges against (node, rank, deg) plus one
      combiner-sum — the fact-scale path (2k exchanges).

    Overflow lint: Σ contrib ≤ total mass = n·S and the oracle computes
    17·Σ in int64 on the Ray side, so n·S·17 must stay under 2^63 —
    n ≤ ~540k at S=10^12. Larger graphs need S scaled down with n (raise
    rather than silently wrap).
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate(
                    [batch["part_a"].to_numpy(np.int64), batch["part_b"].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [batch["part_b"].to_numpy(np.int64), batch["part_a"].to_numpy(np.int64)]
                ),
            }
        )

    directed = edges.map_batches(both_dirs, batch_format="pandas").materialize()
    deg_df = to_pandas_with_schema(
        combiner_aggregate(directed, "src", {"deg": (None, "count")})
    ).rename(columns={"src": "node"})
    n_nodes = len(deg_df)
    if n_nodes == 0:
        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype=np.int64),
                "rank_scaled": pd.Series([], dtype=np.int64),
            }
        )
    if n_nodes * 17 > (2**63 - 1) // _PR_SCALE:
        raise ValueError(
            f"pagerank: {n_nodes} nodes overflows int64 at S={_PR_SCALE}; scale S down with n"
        )

    if n_nodes <= broadcast_nodes_threshold:
        # node-dimension broadcast path: rank/deg as one positional numpy
        # lookup shipped once per iteration, edges streamed in place
        nodes = np.sort(deg_df["node"].to_numpy(np.int64))
        deg = deg_df.set_index("node")["deg"].reindex(nodes).to_numpy(np.int64)
        rank = np.full(n_nodes, _PR_SCALE, dtype=np.int64)
        for _ in range(iterations):
            contrib_ref = ray.put((nodes, rank // deg))

            def contribs(batch: pd.DataFrame) -> pd.DataFrame:
                nd, cv = ray.get(contrib_ref) if isinstance(contrib_ref, ray.ObjectRef) else contrib_ref
                src = batch["src"].to_numpy(np.int64)
                c = cv[np.searchsorted(nd, src)]
                out = pd.DataFrame({"dst": batch["dst"].to_numpy(np.int64), "c": c})
                return out.groupby("dst", as_index=False)["c"].sum()

            sums = to_pandas_with_schema(
                combiner_aggregate(
                    directed.map_batches(contribs, batch_format="pandas"),
                    "dst",
                    {"s": ("c", "sum")},
                    num_partitions=num_partitions,
                )
            )
            s = (
                sums.set_index("dst")["s"]
                .reindex(nodes)
                .fillna(0)
                .to_numpy(np.int64)
            )
            rank = _PR_TELEPORT + (17 * s) // 20
        return (
            pd.DataFrame({"p_partkey": nodes, "rank_scaled": rank})
            .astype({"p_partkey": "int64", "rank_scaled": "int64"})
            .reset_index(drop=True)
        )

    # Dataset path: rank never leaves the cluster
    deg_ds = rd.from_pandas(deg_df).materialize()
    rank_df = deg_df.copy()
    rank_df["rank"] = np.int64(_PR_SCALE)
    rank_ds = rd.from_pandas(rank_df[["node", "rank", "deg"]])
    for _ in range(iterations):

        def edge_contribs(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            # lf: edges (src,dst); rf: (node, rank, deg)
            r = rf.set_index("node")
            src = lf["src"].to_numpy(np.int64)
            c = (
                r["rank"].reindex(src).to_numpy(np.int64)
                // r["deg"].reindex(src).to_numpy(np.int64)
            )
            out = pd.DataFrame({"dst": lf["dst"].to_numpy(np.int64), "c": c})
            return out.groupby("dst", as_index=False)["c"].sum()

        contrib_ds = copartition_apply(
            directed, rank_ds, "src", "node", edge_contribs, num_partitions=num_partitions
        )
        sums_ds = combiner_aggregate(
            contrib_ds, "dst", {"s": ("c", "sum")}, num_partitions=num_partitions
        )

        def next_rank(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            # lf: (dst, s); rf: (node, deg) — undirected graph: every node
            # has an in-edge, so lf covers every node of rf
            m = lf.set_index("dst")["s"]
            node = rf["node"].to_numpy(np.int64)
            s = m.reindex(node).fillna(0).to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "node": node,
                    "rank": _PR_TELEPORT + (17 * s) // 20,
                    "deg": rf["deg"].to_numpy(np.int64),
                }
            )

        rank_ds = copartition_apply(
            sums_ds, deg_ds, "dst", "node", next_rank, num_partitions=num_partitions
        ).materialize()

    out = to_pandas_with_schema(rank_ds)[["node", "rank"]].rename(
        columns={"node": "p_partkey", "rank": "rank_scaled"}
    )
    return (
        out.sort_values("p_partkey")
        .astype({"p_partkey": "int64", "rank_scaled": "int64"})
        .reset_index(drop=True)
    )


def bfs_hops_from_edges(
    edges: "rd.Dataset",
    max_hops: int = 4,
    seed_mod: int = 97,
    num_partitions: Optional[int] = None,
) -> pd.DataFrame:
    """Multi-source BFS over an undirected edge list (``part_a``/``part_b``):
    min hop-distance from the seed set ``{node : node % seed_mod == 0}`` —
    the sparse-FRONTIER iterative-graph shape (PageRank iterates dense
    fixed-point mass, connected components propagate labels; BFS expands a
    frontier that starts tiny, peaks, and empties).

    Frontier and distance vectors are node-DIMENSION-sized (the part dim)
    — the same dim-broadcast assumption as the PageRank broadcast plan.
    Each round broadcasts only the CURRENT frontier (``ray.put`` once, read
    lazily per task), streams the edge Dataset in place (edges never
    reshuffle), and ships only the round's newly-reached node ids through
    one distinct-combiner exchange — per-round traffic is bounded by the
    frontier's neighborhood, not the graph. Rounds stop early when the
    frontier empties, so disconnected or shallow graphs never pay
    ``max_hops`` passes. Fact-scale node sets (node ids too many to hold
    in a vector) use the bounded-hop label-propagation form of the
    connected-components machinery (``ops/graph.py``) instead.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate(
                    [batch["part_a"].to_numpy(np.int64), batch["part_b"].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [batch["part_b"].to_numpy(np.int64), batch["part_a"].to_numpy(np.int64)]
                ),
            }
        )

    directed = edges.map_batches(both_dirs, batch_format="pandas").materialize()
    nodes_df = to_pandas_with_schema(
        combiner_aggregate(directed, "src", {"deg": (None, "count")})
    )
    empty = pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype=np.int64),
            "hops": pd.Series([], dtype=np.int64),
        }
    )
    if len(nodes_df) == 0:
        return empty
    nodes = np.sort(nodes_df["src"].to_numpy(np.int64))
    dist = np.full(len(nodes), -1, dtype=np.int64)
    seed_mask = nodes % seed_mod == 0
    if not seed_mask.any():
        return empty
    dist[seed_mask] = 0
    frontier = nodes[seed_mask]
    hops = 0
    while len(frontier) and hops < max_hops:
        hops += 1
        f_ref = ray.put(np.sort(frontier))

        def reach(batch: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(f_ref) if isinstance(f_ref, ray.ObjectRef) else f_ref
            src = batch["src"].to_numpy(np.int64)
            m = np.isin(src, f)
            d = np.unique(batch["dst"].to_numpy(np.int64)[m])
            return pd.DataFrame({"dst": d})

        reached = to_pandas_with_schema(
            combiner_aggregate(
                directed.map_batches(reach, batch_format="pandas"),
                "dst",
                {"c": (None, "count")},
                num_partitions=num_partitions,
            )
        )
        r = reached["dst"].to_numpy(np.int64)
        pos = np.searchsorted(nodes, r)
        new = r[dist[pos] < 0]
        dist[np.searchsorted(nodes, new)] = hops
        frontier = new
    keep = dist >= 0
    return (
        pd.DataFrame({"p_partkey": nodes[keep], "hops": dist[keep]})
        .astype({"p_partkey": "int64", "hops": "int64"})
        .reset_index(drop=True)
    )


def part_reach_hops(
    sf_dir: str, max_hops: int = 4, seed_mod: int = 97, min_support: int = 2
) -> pd.DataFrame:
    """Hop distance of every part reachable within ``max_hops`` co-purchase
    hops of the seed parts (keys divisible by ``seed_mod``) — blast-radius /
    contamination-spread analysis over the same graph PageRank ranks.
    See :func:`bfs_hops_from_edges`."""
    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    edges = part_pair_cooccurrence(sf_dir, min_support=min_support)
    return bfs_hops_from_edges(edges, max_hops=max_hops, seed_mod=seed_mod)


def _bfs_sql(max_hops: int = 4, seed_mod: int = 97, min_support: int = 2) -> str:
    return f"""
WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
),
e AS (SELECT pa AS src, pb AS dst FROM pr UNION ALL SELECT pb, pa FROM pr),
r(node, hops) AS (
  SELECT DISTINCT src, 0 FROM e WHERE src % {seed_mod} = 0
  UNION
  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node WHERE r.hops < {max_hops}
)
SELECT node AS p_partkey, CAST(MIN(hops) AS BIGINT) AS hops
FROM r GROUP BY node ORDER BY node
"""


PART_REACH_HOPS_SQL = _bfs_sql()


def part_pagerank(sf_dir: str, iterations: int = 5, min_support: int = 2) -> pd.DataFrame:
    """PageRank centrality of parts in the CO-PURCHASE graph (edges =
    unordered part pairs sharing ≥ ``min_support`` distinct orders, from
    :func:`part_pair_cooccurrence`) — the iterative-graph-algorithm member
    of the §2.9/graph family (three-tier CC covers components; this covers
    centrality). See :func:`pagerank_from_edges` for the integer-exact
    iteration scheme and both physical plans.
    """
    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    edges = part_pair_cooccurrence(sf_dir, min_support=min_support)
    return pagerank_from_edges(edges, iterations=iterations)


def _pagerank_sql(iterations: int = 5, min_support: int = 2) -> str:
    teleport = _PR_TELEPORT
    body = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
),
e AS (SELECT pa AS src, pb AS dst FROM pr UNION ALL SELECT pb, pa FROM pr),
deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)"""
    for i in range(1, iterations + 1):
        body += f""",
r{i} AS (
  SELECT e.dst AS node,
         CAST({teleport} + (17 * SUM(r{i - 1}.r // deg.d)) // 20 AS BIGINT) AS r
  FROM e JOIN r{i - 1} ON e.src = r{i - 1}.node JOIN deg ON e.src = deg.node
  GROUP BY e.dst
)"""
    body += f"""
SELECT node AS p_partkey, r AS rank_scaled FROM r{iterations} ORDER BY node
"""
    return body


PART_PAGERANK_SQL = _pagerank_sql()


def kcore_from_edges(
    edges: "rd.Dataset",
    k: int = 2,
    rounds: int = 8,
    broadcast_nodes_threshold: int = 2_000_000,
    num_partitions: Optional[int] = None,
) -> pd.DataFrame:
    """k-CORE decomposition over an UNDIRECTED edge list (columns
    ``part_a``/``part_b``): iteratively peel nodes of degree < ``k`` until
    fixpoint — the density-peeling fixpoint (community-core extraction,
    spam-graph pruning). A THIRD iterative-graph shape next to PageRank
    (fixed-iteration value propagation) and BFS (growing frontier): here
    the STATE is a monotonically SHRINKING alive set, so every round's
    work strictly decreases and early exit at the fixpoint is a no-op
    transformation (identical output to running all ``rounds``).

    Both engines run the same ``rounds`` peel schedule, so the unrolled
    DuckDB oracle matches verbatim even when the schedule is longer than
    convergence needs. Output: each node of the round-``rounds`` edge set
    with its degree in that set (= the k-core with in-core degrees once
    converged; pure integer arithmetic throughout — nothing to drift).

    Two physical plans, proven identical by a forced-path test
    (tests/test_kcore.py):

    * nodes ≤ ``broadcast_nodes_threshold`` (node set = the PART
      dimension): the alive set is ONE sorted-int64 ``ray.put`` broadcast;
      each round streams the materialized (pair-bounded) edge set in
      place — per-batch both-endpoint membership + partial degree counts
      — through one node-keyed combiner exchange. Edges are NEVER
      reshuffled; one exchange per round, node-dim driver state.
    * above threshold: the alive set stays a DATASET; each round is two
      copartition semi-joins (endpoint filters) + one combiner-sum, and
      the driver sees only the alive COUNT (one integer per round).
    """
    from xmlschema_ray.engine.stats import isin_sorted
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        to_pandas_with_schema,
    )

    template = pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype=np.int64),
            "core_deg": pd.Series([], dtype=np.int64),
        }
    )
    ed = edges.select_columns(["part_a", "part_b"]).materialize()  # pair-bounded

    def deg_fn(alive_ref):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            a = batch["part_a"].to_numpy(np.int64)
            b = batch["part_b"].to_numpy(np.int64)
            if alive_ref is not None:
                alv = ray.get(alive_ref) if isinstance(alive_ref, ray.ObjectRef) else alive_ref
                m = isin_sorted(a, alv) & isin_sorted(b, alv)
                a, b = a[m], b[m]
            nodes, counts = np.unique(np.concatenate([a, b]), return_counts=True)
            return pd.DataFrame({"node": nodes, "d": counts.astype(np.int64)})

        return partial

    def deg_table(alive_ref) -> pd.DataFrame:
        return to_pandas_with_schema(
            combiner_aggregate(
                ed.map_batches(deg_fn(alive_ref), batch_format="pandas"),
                "node",
                {"d": ("d", "sum")},
                num_partitions=num_partitions,
            )
        )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [batch["part_a"].to_numpy(np.int64), batch["part_b"].to_numpy(np.int64)]
                )
            }
        )

    def deg_ds_of(ds: "rd.Dataset") -> "rd.Dataset":
        return combiner_aggregate(
            ds.map_batches(explode, batch_format="pandas"),
            "node",
            {"d": (None, "count")},
            num_partitions=num_partitions,
        ).materialize()

    # Path choice from a distributed COUNT — the node-dim degree table is
    # only ever collected on the broadcast path, where it fits by the gate.
    deg_ds = deg_ds_of(ed)
    n_nodes = deg_ds.count()
    if n_nodes == 0:
        return template

    if n_nodes <= broadcast_nodes_threshold:
        alive_n = n_nodes
        alive_ref = None
        deg = to_pandas_with_schema(deg_ds)
        for _ in range(rounds):
            new_alive = np.sort(deg.loc[deg["d"] >= k, "node"].to_numpy(np.int64))
            if len(new_alive) == alive_n:
                break  # fixpoint: every later round is a no-op
            alive_n = len(new_alive)
            if alive_n == 0:
                return template
            alive_ref = ray.put(new_alive)
            deg = deg_table(alive_ref)
        out = deg.rename(columns={"node": "p_partkey", "d": "core_deg"})
        return (
            out.sort_values("p_partkey")
            .astype({"p_partkey": "int64", "core_deg": "int64"})
            .reset_index(drop=True)
        )

    # Dataset path: the alive set never leaves the cluster
    def semi(col):
        def fn(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            return lf[lf[col].isin(rf["node"])]

        return fn

    cur = ed
    alive_n = n_nodes
    for _ in range(rounds):
        alive_ds = deg_ds.map_batches(
            lambda b: b.loc[b["d"] >= k, ["node"]], batch_format="pandas"
        ).materialize()
        new_n = alive_ds.count()
        if new_n == alive_n:
            break  # fixpoint: deg_ds already holds the in-core degrees
        alive_n = new_n
        if alive_n == 0:
            return template
        cur = copartition_apply(
            copartition_apply(cur, alive_ds, "part_a", "node", semi("part_a"),
                              num_partitions=num_partitions),
            alive_ds,
            "part_b",
            "node",
            semi("part_b"),
            num_partitions=num_partitions,
        ).materialize()
        deg_ds = deg_ds_of(cur)
    final = to_pandas_with_schema(deg_ds)
    if not len(final.columns) or not len(final):
        return template
    out = final.rename(columns={"node": "p_partkey", "d": "core_deg"})
    return (
        out.sort_values("p_partkey")
        .astype({"p_partkey": "int64", "core_deg": "int64"})
        .reset_index(drop=True)
    )


def part_kcore(sf_dir: str, k: int = 2, rounds: int = 8, min_support: int = 2) -> pd.DataFrame:
    """k-core of the part co-purchase graph (edges from
    :func:`part_pair_cooccurrence`) — the dense-subgraph members and
    their in-core degrees. See :func:`kcore_from_edges`."""
    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    edges = part_pair_cooccurrence(sf_dir, min_support=min_support)
    return kcore_from_edges(edges, k=k, rounds=rounds)


def _kcore_sql(k: int = 2, rounds: int = 8, min_support: int = 2) -> str:
    body = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
)"""
    prev = "e0"
    # MATERIALIZED: each e_i is referenced 4x downstream — DuckDB's default
    # CTE inlining would expand the chain 4^rounds times and exhaust file
    # handles re-opening the parquet source
    for i in range(1, rounds + 1):
        body += f""",
d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT pa AS node FROM {prev} UNION ALL SELECT pb FROM {prev}
  ) GROUP BY 1
),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  SELECT pa, pb FROM {prev}
  WHERE pa IN (SELECT node FROM a{i}) AND pb IN (SELECT node FROM a{i})
)"""
        prev = f"e{i}"
    body += f"""
SELECT node AS p_partkey, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
  SELECT pa AS node FROM {prev} UNION ALL SELECT pb FROM {prev}
) GROUP BY 1 ORDER BY 1
"""
    return body


PART_KCORE_SQL = _kcore_sql()


# -- iterative model training (full-batch gradient descent) ------------------

_LR_SCALE = 1_000_000  # fixed-point scale for weights / probabilities
_LR_DEN = 4  # learning rate 1/4 as an exact rational


from xmlschema_ray.pipelines.common import tdiv_int as _tdiv_int  # canonical helper


def logreg_train_orders(
    sf_dir: str, iterations: int = 5, init_weights: tuple = (0, 0)
) -> pd.DataFrame:
    """Distributed MODEL TRAINING: full-batch gradient descent for a
    logistic classifier P(order is finalized | price bucket) — the
    iterative broadcast-weights / gradient-partials loop (the
    parameter-server shape every quality-classifier training pipeline
    needs), in fully INTEGER arithmetic so the result is bit-exact at any
    parallelism and the DuckDB oracle replays every iteration verbatim.

    Model: y = 1{o_orderstatus='F'}, feature x = totalprice in $100k
    buckets (quantized at ingest — part of the integer-exact design).
    The squashing function is the RATIONAL sigmoid σ(z) = (1 + z/(1+|z|))/2
    (exactly representable in fixed point; the transcendental exp() would
    make bit-exactness hinge on libm ulp agreement between engines). With
    weights scaled by S=10^6:

        Z_i  = W0 + W1·x_i                       (scaled logit, int64)
        p_i  = (S + trunc(Z_i·S / (S+|Z_i|))) // 2   ∈ [0, S]
        r_i  = p_i − y_i·S                        (scaled residual)
        g0   = Σ r_i,  g1 = Σ r_i·x_i             (integer sums — order-free)
        W   −= trunc(g / (4·n))                   (lr = 1/4, exact rational)

    All divisions truncate toward zero to match DuckDB ``//``. Physical
    plan: the 2-int projection is materialized once (16 B/row — the same
    decision :func:`pagerank_from_edges` takes for its edge list; past
    object-store capacity you'd re-scan the pruned parquet instead, which
    is the inherent cost of FULL-batch GD); each iteration broadcasts two
    integers and runs ONE combiner pass emitting per-batch (g0, g1, n)
    partials — k iterations, k passes, zero shuffles. Overflow lint:
    |Z|·S must stay in int64; bounded weights (|ΔW0| ≤ S/4, |ΔW1| ≤ S per
    step) keep |Z| < 2^25 for any realistic iteration count, and the pass
    raises rather than wraps.

    Returns the per-iteration weight trace ``(iter, w0_scaled, w1_scaled)``
    — the oracle checks every step, not just the final fit. Reference
    parity: the reference has no training loop; this extends §2.12's
    extension surface with the iterative-refinement shape (same contract
    as ``part_pagerank``: fixed iterations, scaled-int state).
    """
    from xmlschema_ray.ops.relational import to_pandas_with_schema

    S = _LR_SCALE

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(batch["o_totalprice"].to_numpy(np.float64) * 100 + 0.5).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "y": (batch["o_orderstatus"].to_numpy() == "F").astype(np.int64),
                "x": cents // 10_000_000,
            }
        )

    feats = (
        rd.read_parquet(table_path(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])
        .map_batches(project, batch_format="pandas")
        .materialize()
    )

    # warm start: training state is two integers, so a checkpointed run
    # resumes BIT-EXACTLY — trace(k1) + trace(k2, init=last) == trace(k1+k2)
    # (pinned in tests/test_analytics.py); the oracle uses the cold start
    w0, w1 = int(init_weights[0]), int(init_weights[1])
    trace = []
    for it in range(1, iterations + 1):
        w_ref = ray.put((w0, w1))

        def grad_partial(batch: pd.DataFrame) -> pd.DataFrame:
            a, b = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
            x = batch["x"].to_numpy(np.int64)
            y = batch["y"].to_numpy(np.int64)
            z = a + b * x
            if np.abs(z).max(initial=0) > (2**62) // S:
                raise OverflowError("logreg: |logit| overflows int64 at S=1e6")
            num = z * S
            q = np.sign(num) * (np.abs(num) // (S + np.abs(z)))
            r = (S + q) // 2 - y * S
            return pd.DataFrame(
                {
                    "g0": [int(r.sum())],
                    "g1": [int((r * x).sum())],
                    "n": [len(x)],
                }
            )

        parts = to_pandas_with_schema(
            feats.map_batches(grad_partial, batch_format="pandas")
        )
        g0, g1 = int(parts["g0"].sum()), int(parts["g1"].sum())
        n = int(parts["n"].sum())
        if n == 0:  # empty corpus: no gradient exists; emit the zero trace
            trace = [(i, 0, 0) for i in range(1, iterations + 1)]
            break
        w0 -= _tdiv_int(g0, _LR_DEN * n)
        w1 -= _tdiv_int(g1, _LR_DEN * n)
        trace.append((it, w0, w1))

    return pd.DataFrame(trace, columns=["iter", "w0_scaled", "w1_scaled"]).astype("int64")


def _logreg_sql(iterations: int = 5) -> str:
    S = _LR_SCALE
    body = f"""
WITH t AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 10000000 AS x
  FROM orders
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b)"""
    for i in range(1, iterations + 1):
        body += f""",
g{i} AS (
  SELECT CAST(SUM(({S} + (z * {S}) // ({S} + ABS(z))) // 2 - y * {S}) AS BIGINT) AS g0,
         CAST(SUM((({S} + (z * {S}) // ({S} + ABS(z))) // 2 - y * {S}) * x) AS BIGINT) AS g1
  FROM (SELECT y, x, a + b * x AS z FROM t, w{i - 1})
),
w{i} AS (
  SELECT a - g0 // ({_LR_DEN} * n) AS a, b - g1 // ({_LR_DEN} * n) AS b
  FROM w{i - 1}, g{i}, n
)"""
    body += (
        "\nSELECT * FROM (\n"
        + "\n  UNION ALL ".join(
            f"SELECT CAST({i} AS BIGINT) AS iter, a AS w0_scaled, b AS w1_scaled FROM w{i}"
            for i in range(1, iterations + 1)
        )
        + "\n) ORDER BY iter\n"
    )
    return body


LOGREG_TRAIN_SQL = _logreg_sql()


def session_window_overlap(
    sf_dir: str,
    gap_minutes: int = 30,
    min_events: int = 8,
    num_ranges: Optional[int] = None,
) -> pd.DataFrame:
    """Two-sided INTERVAL OVERLAP JOIN: every (user session) × (busy
    window) pair whose closed time intervals intersect — sessions are the
    gap-based intervals of :func:`peak_concurrent_sessions` (same
    30-minute convention); a busy window is a (event_type, day) group
    with ≥ ``min_events`` events, spanning its first..last event. The
    incident-correlation join ("which user sessions were live during each
    traffic burst") — the one interval shape the suite lacked: sweep-line
    computes pointwise aggregates, as-of joins take the latest edge; the
    overlap join pairs INTERVALS with INTERVALS.

    Distributed shape (temporal range replication + ownership dedup):

    1. Both interval sets are built distributedly (user-hash sessionize;
       (type, day) min/max/count combiner).
    2. A :func:`sample_range_bounds` pass over session starts picks time
       ranges; each interval REPLICATES to every range it overlaps
       (vectorized two-searchsorted explode, like the sliding-window
       key explode but data-driven).
    3. ONE co-partitioning exchange on the range id; inside each
       partition the join is sort + searchsorted (candidates are the
       ``w_start ≤ s_end`` prefix, exact-filtered by ``w_end ≥ s_start``).
    4. A pair is emitted only in the range that OWNS ``max(s_start,
       w_start)`` — every true overlap is present there (both intervals
       cover that instant, hence overlap that range) and nowhere else
       counted, so replication never duplicates output.

    Busy windows are (types × days)-bounded here, but the plan never
    relies on that: neither side is broadcast or collected, so the same
    code carries two fact-sized interval sets. Overlap length is exact
    integer microseconds.
    """
    from xmlschema_ray.ops.relational import (
        combiner_aggregate,
        copartition_apply,
        derive_num_partitions,
        hash_partition_apply,
        sample_range_bounds,
        to_pandas_with_schema,
    )

    template = pd.DataFrame(
        {
            "user_id": pd.array([], dtype="int64"),
            "s_start": pd.Series([], dtype="datetime64[us]"),
            "s_end": pd.Series([], dtype="datetime64[us]"),
            "event_type": pd.Series([], dtype=object),
            "day": pd.Series([], dtype="datetime64[us]"),
            "overlap_us": pd.array([], dtype="int64"),
        }
    )
    events_path = table_path(sf_dir, "events")
    try:  # zero-row corpus: no schema survives the empty pipeline (footer-only check)
        import pyarrow.parquet as _pq

        if _pq.read_metadata(events_path).num_rows == 0:
            return template
    except Exception:
        pass  # directory inputs skip the guard; non-empty paths proceed
    ds = rd.read_parquet(events_path, columns=["user_id", "ts", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(part: pd.DataFrame) -> pd.DataFrame:
        p = part.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = p["user_id"].ne(p["user_id"].shift())
        brk = new_user | (p["ts"].diff() > gap)
        sid = brk.cumsum()
        g = p.groupby(sid.to_numpy()).agg(
            user_id=("user_id", "first"), s_start=("ts", "min"), s_end=("ts", "max")
        )
        return g.reset_index(drop=True)

    sess = hash_partition_apply(
        ds.map_batches(lambda b: b[["user_id", "ts"]], batch_format="pandas"),
        "user_id",
        sessions,
    )

    def add_day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": batch["event_type"], "day": batch["ts"].dt.floor("D"), "ts": batch["ts"]}
        )

    busy = combiner_aggregate(
        ds.map_batches(add_day, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"w_start": ("ts", "min"), "w_end": ("ts", "max"), "n": (None, "count")},
    ).map_batches(
        lambda b: b.loc[b["n"] >= min_events, ["event_type", "day", "w_start", "w_end"]],
        batch_format="pandas",
    )

    nr = num_ranges or derive_num_partitions()
    bounds = sample_range_bounds(sess, ["s_start"], nr)
    bvals = (
        np.sort(np.asarray(bounds[0], dtype="datetime64[us]"))
        if bounds is not None
        else np.array([], dtype="datetime64[us]")
    )

    def make_explode(start_col: str, end_col: str):
        def explode(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch.assign(__r=pd.array([], dtype="int64"))
            s = batch[start_col].to_numpy().astype("datetime64[us]")
            e = batch[end_col].to_numpy().astype("datetime64[us]")
            lo = np.searchsorted(bvals, s, side="right").astype(np.int64)
            hi = np.searchsorted(bvals, e, side="right").astype(np.int64)
            reps = hi - lo + 1
            idx = np.repeat(np.arange(len(batch)), reps)
            # range id = lo[row] + position within the row's replica run
            starts = np.zeros(len(batch), dtype=np.int64)
            starts[1:] = np.cumsum(reps)[:-1]
            rid = lo[idx] + (np.arange(int(reps.sum()), dtype=np.int64) - starts[idx])
            out = batch.iloc[idx].copy(deep=False)
            out["__r"] = rid
            return out

        return explode

    sess_r = sess.map_batches(make_explode("s_start", "s_end"), batch_format="pandas")
    busy_r = busy.map_batches(make_explode("w_start", "w_end"), batch_format="pandas")

    def join_ranges(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for rid, lg in lf.groupby("__r", sort=False):
            rg = rf.loc[rf["__r"] == rid]
            if not len(rg):
                continue
            rg = rg.sort_values("w_start", kind="mergesort")
            ws = rg["w_start"].to_numpy().astype("datetime64[us]")
            we = rg["w_end"].to_numpy().astype("datetime64[us]")
            ss = lg["s_start"].to_numpy().astype("datetime64[us]")
            se = lg["s_end"].to_numpy().astype("datetime64[us]")
            # candidates per session: the w_start <= s_end prefix
            pref = np.searchsorted(ws, se, side="right")
            idx_s = np.repeat(np.arange(len(lg)), pref)
            starts = np.zeros(len(lg), dtype=np.int64)
            starts[1:] = np.cumsum(pref)[:-1]
            idx_w = np.arange(int(pref.sum()), dtype=np.int64) - starts[idx_s]
            keep = we[idx_w] >= ss[idx_s]
            idx_s, idx_w = idx_s[keep], idx_w[keep]
            # ownership: max(s_start, w_start) must land in THIS range
            ov_start = np.maximum(ss[idx_s], ws[idx_w])
            own = np.searchsorted(bvals, ov_start, side="right") == rid
            idx_s, idx_w = idx_s[own], idx_w[own]
            ov_start = ov_start[own]
            ov_end = np.minimum(se[idx_s], we[idx_w])
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": lg["user_id"].to_numpy()[idx_s],
                        "s_start": ss[idx_s],
                        "s_end": se[idx_s],
                        "event_type": rg["event_type"].to_numpy()[idx_w],
                        "day": rg["day"].to_numpy()[idx_w].astype("datetime64[us]"),
                        "overlap_us": (ov_end - ov_start).astype("timedelta64[us]").view("int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else template

    pairs = copartition_apply(sess_r, busy_r, "__r", "__r", join_ranges)
    out = to_pandas_with_schema(pairs)
    if not len(out.columns):
        return template
    out["s_start"] = out["s_start"].astype("datetime64[us]")
    out["s_end"] = out["s_end"].astype("datetime64[us]")
    out["day"] = out["day"].astype("datetime64[us]")
    return (
        out.sort_values(["user_id", "s_start", "event_type", "day"])
        .reset_index(drop=True)[list(template.columns)]
    )


SESSION_WINDOW_OVERLAP_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), sess AS (
  SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
  FROM (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM lagged)
  GROUP BY user_id, sid
), busy AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         min(ts) AS w_start, max(ts) AS w_end
  FROM events GROUP BY 1, 2 HAVING count(*) >= 8
)
SELECT a.user_id, a.s_start, a.s_end, b.event_type, b.day,
       epoch_us(least(a.s_end, b.w_end)) - epoch_us(greatest(a.s_start, b.w_start)) AS overlap_us
FROM sess a JOIN busy b ON a.s_start <= b.w_end AND b.w_start <= a.s_end
ORDER BY a.user_id, a.s_start, b.event_type, b.day
"""


def auc_urgent_price(
    sf_dir: str, num_ranges: Optional[int] = None
) -> pd.DataFrame:
    """EXACT distributed ROC AUC ("does totalprice predict urgency") — the
    model-EVALUATION rank statistic every trained scorer
    (``logreg_train_orders``) needs next. AUC is the probability a random
    positive outscores a random negative, i.e. a global pair count
    ``(#[pos>neg] + ½·#[pos==neg]) / (n_pos·n_neg)`` — a rank statistic
    over a fact-sized score column, NOT a mergeable per-batch mean, so the
    naive plan is a global sort.

    Plan (one range exchange, metadata-sized driver fold — the
    ``extendedprice_deciles`` shape applied to pair counting):

    1. Per-batch partials collapse rows to (score, n_pos, n_neg) counts
       (scores in integer cents, so ties are exact).
    2. :func:`sample_range_bounds` picks score ranges; the range id is
       ``searchsorted(bounds, score)`` — a pure function of the score, so
       ALL partials of a tied value co-locate without a pre-merge.
    3. One co-locating exchange; each range merges its partials, sorts
       locally, and computes its within-range pair counts (Σ np·negs-below
       and the tie term Σ np·nn) plus its (n_pos, n_neg) totals.
    4. The driver folds the per-range rows (≤ num_ranges, metadata-sized):
       cross-range pairs are Σ n_pos(range)·n_neg(below range) by score
       order — PYTHON integers, so the fold cannot overflow at any scale;
       within-range int64 counts are bounded by range balance.

    The only float op is the single final division of exact integers —
    bit-identical in DuckDB, like ``join_size_bounds``' sqrt discipline.
    """
    from xmlschema_ray.ops.relational import (
        derive_num_partitions,
        hash_partition_apply,
        sample_range_bounds,
        to_pandas_with_schema,
    )
    from xmlschema_ray.pipelines.common import cents

    def result(n_pos: int, n_neg: int, gt: int, eq: int) -> pd.DataFrame:
        denom = 2 * n_pos * n_neg
        return pd.DataFrame(
            {
                "n_pos": pd.array([n_pos], dtype="int64"),
                "n_neg": pd.array([n_neg], dtype="int64"),
                "pairs_gt": pd.array([gt], dtype="int64"),
                "pairs_eq": pd.array([eq], dtype="int64"),
                "auc": [float(2 * gt + eq) / float(denom) if denom else float("nan")],
            }
        )

    ds = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_totalprice", "o_orderpriority"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sc = cents(batch["o_totalprice"])
        lab = (batch["o_orderpriority"].to_numpy() == "1-URGENT").astype(np.int64)
        g = pd.DataFrame({"sc": sc, "np_": lab, "nn": 1 - lab}).groupby("sc", sort=False)
        return g.sum().reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    nr = num_ranges or derive_num_partitions()
    bounds = sample_range_bounds(partials, ["sc"], nr)
    bvals = np.sort(np.asarray(bounds[0], dtype=np.int64)) if bounds is not None else None

    def add_range(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        if bvals is None:
            batch["__r"] = np.zeros(len(batch), dtype=np.int64)
        else:
            batch["__r"] = np.searchsorted(
                bvals, batch["sc"].to_numpy(np.int64), side="right"
            ).astype(np.int64)
        return batch

    def per_range(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, g in part.groupby("__r", sort=False):
            v = g.groupby("sc", sort=True)[["np_", "nn"]].sum()
            np_v = v["np_"].to_numpy(np.int64)
            nn_v = v["nn"].to_numpy(np.int64)
            neg_below = np.concatenate(([0], np.cumsum(nn_v)[:-1]))
            rows.append(
                (
                    int(rid),
                    int(np_v.sum()),
                    int(nn_v.sum()),
                    int((np_v * neg_below).sum()),
                    int((np_v * nn_v).sum()),
                )
            )
        return pd.DataFrame(rows, columns=["rid", "n_pos", "n_neg", "gt", "eq"]).astype(
            "int64"
        )

    stats = to_pandas_with_schema(
        hash_partition_apply(partials.map_batches(add_range, batch_format="pandas"), "__r", per_range)
    )
    if not len(stats) or not len(stats.columns):
        return result(0, 0, 0, 0)
    stats = stats.sort_values("rid").reset_index(drop=True)
    n_pos = int(stats["n_pos"].sum())
    n_neg = int(stats["n_neg"].sum())
    neg_below = int(0)
    gt = int(stats["gt"].sum())
    for np_r, nn_r in zip(stats["n_pos"].tolist(), stats["n_neg"].tolist()):
        gt += int(np_r) * neg_below  # Python ints: no overflow at any scale
        neg_below += int(nn_r)
    return result(n_pos, n_neg, gt, int(stats["eq"].sum()))


# -- weighted shortest paths (min-plus relaxation) --------------------------


def sssp_from_edges(
    edges: "rd.Dataset",
    rounds: int = 6,
    seed_mod: int = 97,
    num_partitions: Optional[int] = None,
) -> pd.DataFrame:
    """Multi-source WEIGHTED shortest paths over an undirected weighted
    edge list (``part_a``/``part_b``/``w``, positive integer weights):
    min total weight from the seed set ``{node : node % seed_mod == 0}``
    using paths of at most ``rounds`` edges — the MIN-PLUS RELAXATION
    shape (Bellman-Ford), the fourth iterative-graph member next to BFS
    (unweighted frontier expansion), PageRank (dense mass fixpoint) and
    k-core (shrinking alive set): here the state is a monotonically
    DECREASING distance vector and the per-round merge is ``min``, not
    sum — a different combiner algebra through the same exchange
    machinery.

    The schedule is ``rounds`` FULL relaxation passes; the implementation
    relaxes only from the frontier (nodes whose distance changed last
    round) and early-exits when it empties — a provable no-op versus the
    dense schedule (an edge from an unchanged node re-proposes the same
    candidate its last relaxation already proposed, and min is
    idempotent), so the DuckDB oracle's unrolled dense rounds match
    verbatim. Integer weights keep every distance exact at any
    parallelism.

    Distance/frontier vectors are node-DIMENSION-sized (the same
    dim-broadcast assumption as the BFS/PageRank broadcast plans; the
    fact-scale node-set alternative is the kcore-style copartition
    semi-join). Each round broadcasts the (node, dist) frontier pairs
    ONCE (``ray.put``), streams the edge Dataset in place (edges never
    reshuffle), pre-reduces candidates per batch, and ships per-dst MIN
    partials through one combiner exchange — per-round traffic is
    bounded by the frontier's neighborhood, never the graph.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["w"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "src": np.concatenate(
                    [batch["part_a"].to_numpy(np.int64), batch["part_b"].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [batch["part_b"].to_numpy(np.int64), batch["part_a"].to_numpy(np.int64)]
                ),
                "w": np.concatenate([w, w]),
            }
        )

    directed = edges.map_batches(both_dirs, batch_format="pandas").materialize()
    nodes_df = to_pandas_with_schema(
        combiner_aggregate(directed, "src", {"deg": (None, "count")})
    )
    empty = pd.DataFrame(
        {
            "p_partkey": pd.Series([], dtype=np.int64),
            "dist": pd.Series([], dtype=np.int64),
        }
    )
    if len(nodes_df) == 0:
        return empty
    nodes = np.sort(nodes_df["src"].to_numpy(np.int64))
    sentinel = np.iinfo(np.int64).max
    dist = np.full(len(nodes), sentinel, dtype=np.int64)
    seed_mask = nodes % seed_mod == 0
    if not seed_mask.any():
        return empty
    dist[seed_mask] = 0
    f_nodes = nodes[seed_mask]
    f_dist = np.zeros(len(f_nodes), dtype=np.int64)
    r = 0
    while len(f_nodes) and r < rounds:
        r += 1
        # frontier ships sorted by node so workers binary-search it
        f_ref = ray.put((f_nodes, f_dist))

        def relax(batch: pd.DataFrame) -> pd.DataFrame:
            fn_, fd_ = ray.get(f_ref) if isinstance(f_ref, ray.ObjectRef) else f_ref
            src = batch["src"].to_numpy(np.int64)
            pos = np.searchsorted(fn_, src)
            pos_c = np.minimum(pos, len(fn_) - 1)
            m = fn_[pos_c] == src
            if not m.any():
                return pd.DataFrame(
                    {
                        "dst": pd.Series([], dtype=np.int64),
                        "d": pd.Series([], dtype=np.int64),
                    }
                )
            cand = pd.DataFrame(
                {
                    "dst": batch["dst"].to_numpy(np.int64)[m],
                    "d": fd_[pos_c[m]] + batch["w"].to_numpy(np.int64)[m],
                }
            )
            return cand.groupby("dst", as_index=False)["d"].min()

        reached = to_pandas_with_schema(
            combiner_aggregate(
                directed.map_batches(relax, batch_format="pandas"),
                "dst",
                {"d": ("d", "min")},
                num_partitions=num_partitions,
            )
        )
        if len(reached) == 0:
            break
        rn = reached["dst"].to_numpy(np.int64)
        rdist = reached["d"].to_numpy(np.int64)
        pos = np.searchsorted(nodes, rn)
        better = rdist < dist[pos]
        dist[pos[better]] = rdist[better]
        f_nodes = rn[better]
        f_dist = rdist[better]
        order = np.argsort(f_nodes)
        f_nodes, f_dist = f_nodes[order], f_dist[order]
    keep = dist < sentinel
    return (
        pd.DataFrame({"p_partkey": nodes[keep], "dist": dist[keep]})
        .astype({"p_partkey": "int64", "dist": "int64"})
        .reset_index(drop=True)
    )


def part_sssp(
    sf_dir: str, rounds: int = 6, seed_mod: int = 97, min_support: int = 2
) -> pd.DataFrame:
    """Weighted proximity of every part to the seed parts over the
    co-purchase graph, where tie STRENGTH sets the metric: edge weight
    ``max(1, 1000 // n_orders)`` makes frequently-co-bought pairs CLOSE,
    so ``dist`` ranks each part's affinity to the seed set through at
    most ``rounds`` hops — recommendation-radius / substitution-cost
    analysis the unweighted BFS (``part_reach_hops``) flattens. See
    :func:`sssp_from_edges` for the min-plus plan."""
    from xmlschema_ray.pipelines.relational import part_pair_cooccurrence

    edges = part_pair_cooccurrence(sf_dir, min_support=min_support)

    def weigh(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_orders"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part_a": batch["part_a"].to_numpy(np.int64),
                "part_b": batch["part_b"].to_numpy(np.int64),
                # positive operands: numpy floor-div == DuckDB trunc-div
                "w": np.maximum(1, 1000 // n),
            }
        )

    return sssp_from_edges(
        edges.map_batches(weigh, batch_format="pandas"),
        rounds=rounds,
        seed_mod=seed_mod,
    )


def _sssp_sql(rounds: int = 6, seed_mod: int = 97, min_support: int = 2) -> str:
    """Unrolled dense Bellman-Ford: ``d_i`` is the full distance table
    after ``i`` relaxation rounds (min over the previous table and every
    one-edge extension of it) — each level is node-set-sized, so the
    oracle never enumerates paths."""
    body = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
),
e AS (
  SELECT pa AS src, pb AS dst, GREATEST(1, 1000 // n) AS w FROM pr
  UNION ALL
  SELECT pb, pa, GREATEST(1, 1000 // n) FROM pr
),
d0 AS (
  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS d FROM e
  WHERE src % {seed_mod} = 0
)"""
    for i in range(1, rounds + 1):
        body += f""",
d{i} AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, d{i - 1}.d + e.w AS d
    FROM e JOIN d{i - 1} ON e.src = d{i - 1}.node
  ) GROUP BY node
)"""
    body += f"""
SELECT node AS p_partkey, CAST(d AS BIGINT) AS dist FROM d{rounds} ORDER BY node
"""
    return body


PART_SSSP_SQL = _sssp_sql()


AUC_URGENT_PRICE_SQL = """
WITH s AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS sc,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS lab
  FROM orders
), v AS (
  SELECT sc, SUM(lab) AS np, COUNT(*) - SUM(lab) AS nn FROM s GROUP BY sc
), w AS (
  SELECT np, nn,
         COALESCE(SUM(nn) OVER (ORDER BY sc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM v
), t AS (
  SELECT COALESCE(SUM(np), 0) AS n_pos, COALESCE(SUM(nn), 0) AS n_neg,
         COALESCE(SUM(np * neg_below), 0) AS pairs_gt,
         COALESCE(SUM(np * nn), 0) AS pairs_eq
  FROM w
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(pairs_gt AS BIGINT) AS pairs_gt, CAST(pairs_eq AS BIGINT) AS pairs_eq,
       CASE WHEN n_pos * n_neg = 0 THEN NULL
            ELSE (2 * pairs_gt + pairs_eq) / (2.0 * n_pos * n_neg) END AS auc
FROM t
"""


# -- Gini concentration index (exact distributed rank statistic) --------------


def gini_revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """EXACT Gini concentration of per-customer revenue — the inequality
    rank statistic (G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending
    ranks), the audit behind every "how concentrated is the corpus on few
    heavy keys" question (revenue per account here; token share per
    source in a training-mix review — same operator).

    The AUC sibling: one combiner pass builds the customer-revenue table
    (integer cents), :func:`~xmlschema_ray.ops.relational.global_rank`
    assigns exact ascending ranks with NO global sort, and per-batch
    Σ rank·x partials fold driver-side in PYTHON integers (object-dtype
    partial cells — at 10^12 keys the moment sums overflow int64, the
    fold cannot). The final scaled export is EXACT RATIONAL rounding,
    ``(2·num·10⁹ + den) // (2·den)`` in unbounded integers on the Ray
    side and HUGEINT on DuckDB's — no float division anywhere, so the
    single output row compares hash-exact with no ulp caveat."""
    from xmlschema_ray.ops.relational import combiner_aggregate, global_rank

    orders = rd.read_parquet(
        table_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(np.int64),
                "x": np.floor(
                    batch["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )

    rev = combiner_aggregate(
        orders.map_batches(to_cents, batch_format="pandas"), "o_custkey", {"x": ("x", "sum")}
    )
    ranked, n = global_rank(rev, ["x", "o_custkey"], rank_col="i")

    def part(b: pd.DataFrame) -> pd.DataFrame:
        i = b["i"].to_numpy(np.int64).astype(object)
        x = b["x"].to_numpy(np.int64).astype(object)
        return pd.DataFrame(
            {
                "sixi": pd.Series([int((i * x).sum()) if len(b) else 0], dtype=object),
                "sx": pd.Series([int(x.sum()) if len(b) else 0], dtype=object),
            }
        )

    parts = ranked.map_batches(part, batch_format="pandas").to_pandas()
    sixi = sum(int(v) for v in parts["sixi"])
    sx = sum(int(v) for v in parts["sx"])
    num = 2 * sixi - (n + 1) * sx
    den = n * sx
    gini_e9 = (2 * num * 1_000_000_000 + den) // (2 * den)
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "total_cents": pd.array([sx], dtype="int64"),
            "gini_e9": pd.array([gini_e9], dtype="int64"),
        }
    )


GINI_REVENUE_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS x
  FROM orders GROUP BY 1
), r AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS HUGEINT) AS i FROM rev
), agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(i * x) AS sixi FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS total_cents,
       CAST((2 * (2 * sixi - (n + 1) * sx) * 1000000000 + n * sx)
            // (2 * n * sx) AS BIGINT) AS gini_e9
FROM agg
"""


# -- k-anonymity / l-diversity audit -----------------------------------------


def k_anonymity_audit(
    sf_dir: str, k: int = 5, l_min: int = 2
) -> pd.DataFrame:
    """Re-identification risk audit (Sweeney's k-anonymity + l-diversity):
    for each QUASI-IDENTIFIER combination (nation, market segment), the
    group size ``n`` (a group smaller than ``k`` re-identifies its
    members) and the count of distinct SENSITIVE-value bands (account
    balance in 1000-unit bands; fewer than ``l_min`` distinct values
    means the sensitive attribute leaks even inside a large group) — the
    data-governance screen a privacy review runs before a table ships.

    Scale shape: one (QI, band) combiner pass (per-batch partials, so a
    hot QI ships #batches rows), ONE co-locating exchange on the QI, a
    vectorized size/nunique per group. Output is QI-cardinality rows.
    """
    from xmlschema_ray.ops.relational import combiner_aggregate, hash_partition_apply

    ds = rd.read_parquet(
        table_path(sf_dir, "customer"),
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def band(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                # keep the source int32: the oracle's .df() passes the
                # column through untouched and the compare is dtype-strict
                "c_nationkey": batch["c_nationkey"].to_numpy(np.int32),
                "c_mktsegment": batch["c_mktsegment"].to_numpy(),
                "band": np.floor(
                    batch["c_acctbal"].to_numpy(np.float64) / 1000.0
                ).astype(np.int64),
            }
        )

    counts = combiner_aggregate(
        ds.map_batches(band, batch_format="pandas"),
        ["c_nationkey", "c_mktsegment", "band"],
        {"n": (None, "count")},
    )

    def per_qi(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(["c_nationkey", "c_mktsegment"], sort=False)
        out = gb.agg(n=("n", "sum"), l_bands=("band", "nunique")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["l_bands"] = out["l_bands"].astype(np.int64)
        out["k_at_risk"] = (out["n"] < k).astype(np.int64)
        out["l_at_risk"] = (out["l_bands"] < l_min).astype(np.int64)
        return out

    return hash_partition_apply(counts, ["c_nationkey", "c_mktsegment"], per_qi).sort(
        ["c_nationkey", "c_mktsegment"]
    )


K_ANONYMITY_SQL = """
WITH b AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT band) AS BIGINT) AS l_bands
  FROM b GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, n, l_bands,
       CAST(CASE WHEN n < 5 THEN 1 ELSE 0 END AS BIGINT) AS k_at_risk,
       CAST(CASE WHEN l_bands < 2 THEN 1 ELSE 0 END AS BIGINT) AS l_at_risk
FROM g ORDER BY c_nationkey, c_mktsegment
"""


# -- seasonal decomposition (day-of-week means) -------------------------------


def seasonal_decompose_daily(sf_dir: str) -> pd.DataFrame:
    """Additive seasonal decomposition of the daily event count: each
    day's count splits into the day-of-week SEASONAL mean and the
    RESIDUAL (the anomaly signal every ops dashboard plots; a residual
    spike means something happened beyond the weekly rhythm).

    Day and weekday are pure INTEGER epoch arithmetic (``epoch_us //
    86400e6``, Monday = ``(days + 3) % 7`` — the retention_cohorts
    convention; no calendar-function trap), the seasonal mean is one
    float division of exact integers, and exports are e6-scaled — so the
    oracle replays every value bit-for-bit. One per-day combiner pass;
    the driver fold is calendar-sized (one row per day) at any corpus
    size."""
    from xmlschema_ray.ops.relational import combiner_aggregate

    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["ts"])
    us_per_day = 86_400_000_000

    def day_of(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        return pd.DataFrame({"day": us // us_per_day})

    daily = (
        combiner_aggregate(
            ds.map_batches(day_of, batch_format="pandas"), "day", {"n": (None, "count")}
        )
        .to_pandas()  # calendar-sized: one row per day
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily["dow"] = ((daily["day"] + 3) % 7).astype(np.int64)
    daily["n"] = daily["n"].astype(np.int64)
    g = daily.groupby("dow", sort=False)["n"]
    seasonal = g.transform("sum").to_numpy(np.float64) / g.transform("count").to_numpy(
        np.float64
    )
    daily["seasonal_e6"] = np.floor(seasonal * 1e6 + 0.5).astype(np.int64)
    daily["resid_e6"] = np.floor(
        (daily["n"].to_numpy(np.float64) - seasonal) * 1e6 + 0.5
    ).astype(np.int64)
    return daily[["day", "dow", "n", "seasonal_e6", "resid_e6"]]


SEASONAL_DECOMPOSE_SQL = """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day FROM events
), daily AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY day
), dowed AS (
  SELECT day, (day + 3) % 7 AS dow, n FROM daily
), season AS (
  SELECT *,
         CAST(SUM(n) OVER (PARTITION BY dow) AS DOUBLE)
           / CAST(COUNT(*) OVER (PARTITION BY dow) AS DOUBLE) AS seasonal
  FROM dowed
)
SELECT day, dow, n,
       CAST(floor(seasonal * 1e6 + 0.5) AS BIGINT) AS seasonal_e6,
       CAST(floor((CAST(n AS DOUBLE) - seasonal) * 1e6 + 0.5) AS BIGINT) AS resid_e6
FROM season ORDER BY day
"""


# -- Benford first-digit audit ---------------------------------------------


def benford_digit_counts(
    ds: "rd.Dataset", column: str, batch_size: int = 65536
) -> pd.DataFrame:
    """First-significant-digit counts of ``abs(floor(column))`` — the
    distributed kernel behind :func:`benford_price_audit`.

    Per-batch partial is a 9-int bincount (the smallest combiner shape in
    the repo: a fixed 9-row frame per block regardless of input size), so
    driver state is ``9 × #blocks`` rows at any corpus size. The first
    digit is extracted by REPEATED INTEGER DIVISION (≤ #decimal-digits
    passes over the shrinking ≥10 mask) — integer-exact, so it agrees
    with the oracle's string ``substr`` extraction on every value, unlike
    a ``10**floor(log10(x))`` float path which misclassifies at powers of
    ten. Rows whose integer part is 0 carry no first digit and are
    excluded (both sides).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.abs(batch[column].to_numpy(dtype=np.float64))
        n = np.floor(v).astype(np.int64)
        d = n[n >= 1]
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        cnt = np.bincount(d, minlength=10)[1:10]
        return pd.DataFrame(
            {"digit": np.arange(1, 10, dtype=np.int64), "n": cnt.astype(np.int64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    agg = (
        partials.to_pandas()
        .groupby("digit", sort=True)["n"]
        .sum()
        .reset_index()
    )
    return agg[agg["n"] > 0].reset_index(drop=True)


def benford_price_audit(sf_dir: str, column: str = "l_extendedprice") -> pd.DataFrame:
    """Benford's-law conformance audit of a money column — the
    fraud/corruption data-quality screen (Nigrini 2012): naturally-grown
    multiplicative quantities put ~30.1% of first digits at 1, and a
    fabricated or truncated column shows up as a deviation long before
    any row-level facet fires.

    Distribution-level auditing complements the row-level facet channel
    the same way ``drift_check`` does (reference parity: the numeric
    facet family, ``/root/reference/xmlschema/validators/facets.py``,
    audits each VALUE; this audits the population). Exported columns are
    integer-exact: raw counts plus per-mille observed and Benford-expected
    shares via the repo's ``floor(x + 0.5)`` scaled-int convention —
    identical float64 expression order on both engines.
    """
    ds = rd.read_parquet(table_path(sf_dir, "lineitem"), columns=[column])
    agg = benford_digit_counts(ds, column)
    n = agg["n"].to_numpy(dtype=np.float64)
    total = float(n.sum())
    dig = agg["digit"].to_numpy(dtype=np.float64)
    agg["obs_pm"] = np.floor(1000.0 * n / total + 0.5).astype(np.int64)
    agg["exp_pm"] = np.floor(1000.0 * np.log10(1.0 + 1.0 / dig) + 0.5).astype(np.int64)
    return agg


BENFORD_PRICE_SQL = """
WITH src AS (
  SELECT CAST(floor(abs(l_extendedprice)) AS BIGINT) AS v FROM lineitem
), agg AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit, COUNT(*) AS n
  FROM src WHERE v >= 1 GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total FROM agg
)
SELECT digit, n,
       CAST(floor(1000.0 * n / total + 0.5) AS BIGINT) AS obs_pm,
       CAST(floor(1000.0 * log10(1.0 + 1.0 / digit) + 0.5) AS BIGINT) AS exp_pm
FROM agg CROSS JOIN tot
ORDER BY digit
"""


def hll_sliding_window_users(
    sf_dir: str, window_days: int = 7, p: int = 12
) -> pd.DataFrame:
    """SLIDING-WINDOW HyperLogLog distinct-user registers — the mergeable
    sketch × temporal window composition (the reason mergeable sketches
    exist in streaming systems: keep one tiny per-day sketch and answer
    ANY trailing window by register-max merge, never rescanning history).
    The approximate sibling of the exact ``weekly_active_users`` rolling
    COUNT DISTINCT: that op ships compressed (window, user) pairs and
    pays a user-cardinality exchange per window; this one ships ≤ m
    register rows per day regardless of user count — at 10^9 users/day
    the difference between a corpus-sized exchange and a 4096-row one.
    Window membership merges by MAX, which is idempotent, so per-batch
    partials need no pre-distinct (cross-batch duplicate (day, user)
    contributions collapse in the combiner) and late/duplicate feeds
    never inflate the sketch — the exactly-once-free property counting
    can't give.
    Registers follow the repo's md5-HLL oracle convention
    (``hll_vocab_by_source``): 64-bit hash = first 16 md5 hex chars of
    the user id, top ``p`` bits pick the register, rank = leading-zero
    count of the remaining 64−p bits + 1 (cap 64−p+1), derived with
    EXACT integer algebra (frexp on a < 2^52 remainder) — DuckDB
    re-derives every (window, bucket, rank) cell in string algebra, so
    the compare proves the bucket/rank/window-merge machinery
    bit-for-bit, not an estimate tolerance. Day keys are pure integer
    epoch arithmetic (epoch_us // 86.4e9 — no calendar trap); output is
    one row per (window_end_day, hit register).
    """
    import hashlib

    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema

    if p != 12:
        raise ValueError(
            "hll_sliding_window_users: p=12 is the oracle contract (3 hex "
            "chars of bucket, 13-char remainder < 2^52 so frexp is exact)"
        )
    shift = 64 - p
    day_us = np.int64(86_400_000_000)
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "window_end_day": pd.Series([], dtype="int64"),
                "bucket": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        day = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // day_us
        ).astype(np.int64)
        uid = batch["user_id"].to_numpy(np.int64)
        # md5 once per DISTINCT user in the batch, fanned back out
        uu, inv = np.unique(uid, return_inverse=True)
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
                for u in uu
            ),
            dtype=np.uint64,
            count=len(uu),
        )
        bucket = (h >> np.uint64(shift)).astype(np.int64)[inv]
        rem = (h & np.uint64((1 << shift) - 1)).astype(np.float64)
        exp = np.frexp(rem)[1]
        rank = np.where(rem > 0, (shift + 1) - exp, shift + 1).astype(np.int64)[inv]
        d = pd.DataFrame({"day": day, "bucket": bucket, "rank": rank})
        # max is idempotent: per-(day, bucket) max partial, then explode
        # each day to its window_days window members
        g = d.groupby(["day", "bucket"], as_index=False)["rank"].max()
        frames = [
            pd.DataFrame(
                {
                    "window_end_day": g["day"].to_numpy(np.int64) + o,
                    "bucket": g["bucket"].to_numpy(np.int64),
                    "rank": g["rank"].to_numpy(np.int64),
                }
            )
            for o in range(window_days)
        ]
        return pd.concat(frames, ignore_index=True)

    merged = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            ["window_end_day", "bucket"],
            {"rank": ("rank", "max")},
        )
    )
    merged = merged.astype(
        {"window_end_day": "int64", "bucket": "int64", "rank": "int64"}
    )
    return merged.sort_values(["window_end_day", "bucket"]).reset_index(drop=True)


def event_activity_islands(sf_dir: str) -> pd.DataFrame:
    """GAPS-AND-ISLANDS interval coalescing: merge each user's overlapping
    (or touching) activity intervals into MAXIMAL islands — the classic
    SQL-hard sequential shape completing the suite's interval family
    (``no_overlap`` CHECKS intervals, ``session_window_overlap`` JOINS
    them; this COALESCES them — the uptime/coverage primitive behind
    "how long was the user actually active" and billing-period merging).

    Intervals derive deterministically from the raw table exactly as
    ``val_interval_overlap`` builds them ([ts, ts + dur) with
    ``dur = floor(|value|·1e6)·997 mod 24 h``, exact int64 µs), so both
    engines coalesce identical inputs. An island breaks where a start
    strictly exceeds the RUNNING MAX of all earlier ends (touching
    intervals merge) — the running max, not the previous end, because a
    long early interval can swallow several later ones that an
    adjacent-pair compare would split.

    ONE co-locating hash exchange brings each user's intervals whole;
    inside the partition the sweep is a vectorized sort + per-user int64
    cummax + cumsum island ids + one grouped min/max/count — no per-user
    Python. Output is island-sized; every column is exact integer µs, so
    the oracle's window-function replay compares hash-exact."""
    from xmlschema_ray.ops.relational import hash_partition_apply, to_pandas_with_schema

    ds = rd.read_parquet(
        table_path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "island": pd.Series([], dtype="int64"),
            "island_start_us": pd.Series([], dtype="int64"),
            "island_end_us": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )

    def islands(part: pd.DataFrame) -> pd.DataFrame:
        ok = (part["ts"].notna() & part["value"].notna()).to_numpy()
        p = part[ok]
        if not len(p):
            return empty
        s = p["ts"].to_numpy("datetime64[us]").view(np.int64)
        v = p["value"].to_numpy(np.float64)
        dur = (np.floor(np.abs(v) * 1e6).astype(np.int64) * 997) % 86_400_000_000
        e = s + dur
        d = pd.DataFrame(
            {
                "u": p["user_id"].to_numpy(np.int64),
                "eid": p["event_id"].to_numpy(np.int64),
                "s": s,
                "e": e,
            }
        ).sort_values(["u", "s", "eid"], kind="mergesort")
        u = d["u"].to_numpy()
        sv = d["s"].to_numpy()
        ev = d["e"].to_numpy()
        new_user = np.empty(len(d), dtype=bool)
        new_user[0] = True
        np.not_equal(u[1:], u[:-1], out=new_user[1:])
        grp = np.cumsum(new_user)
        cm = pd.Series(ev).groupby(grp).cummax().to_numpy()
        prevcov = np.roll(cm, 1)
        brk = new_user | (sv > prevcov)
        island_g = np.cumsum(brk)  # global island id across the partition
        # per-user 1-based ordinal: subtract the user's first island id - 1
        first_of_user = np.maximum.accumulate(np.where(new_user, island_g, 0))
        island = island_g - first_of_user + 1
        g = pd.DataFrame(
            {"u": u, "island": island, "s": sv, "e": ev}
        ).groupby(["u", "island"], as_index=False).agg(
            island_start_us=("s", "min"),
            island_end_us=("e", "max"),
            n_events=("s", "size"),
        )
        return g.rename(columns={"u": "user_id"}).astype("int64")

    out = to_pandas_with_schema(hash_partition_apply(ds, "user_id", islands))
    if not len(out.columns):
        return empty
    return (
        out.sort_values(["user_id", "island"]).reset_index(drop=True).astype("int64")
    )


EVENT_ACTIVITY_ISLANDS_SQL = """
WITH iv AS (
  SELECT event_id, user_id, epoch_us(ts) AS s,
         epoch_us(ts)
           + ((CAST(FLOOR(ABS(value) * 1000000) AS BIGINT) * 997) % 86400000000) AS e
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), o AS (
  SELECT user_id, s, e,
    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
  FROM iv
), g AS (
  SELECT user_id, s, e,
    SUM(CASE WHEN pc IS NULL OR s > pc THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
  FROM o
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       CAST(MIN(s) AS BIGINT) AS island_start_us,
       CAST(MAX(e) AS BIGINT) AS island_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY 1, 2 ORDER BY user_id, island
"""


_RQS_BINS = 25
_RQS_WIDTH_C = 1600  # cents per bin: 25 bins cover value ∈ [0, 400)


def rolling_value_quantile_sketch(
    sf_dir: str, window_days: int = 7
) -> pd.DataFrame:
    """ROLLING QUANTILES from mergeable histogram sketches — the ADDITIVE
    sketch × temporal window composition pairing
    :func:`hll_sliding_window_users`' max-merge one (the two merge
    algebras of streaming sketch systems): per-day fixed-bin int64
    histograms of the event value merge BY ADDITION into every trailing
    ``window_days`` window, then p50/p95 interpolate from each window's
    25-cell histogram — rolling latency-percentile dashboards without
    ever co-locating a window's raw values (the exact rolling quantile
    would ship every value to its window owner; this ships ≤25 integer
    cells per day at any event rate).

    Exactness: cells are integer counts (order-independent merge); the
    quantile finish calls the ENGINE's own
    :func:`~xmlschema_ray.engine.stats.histogram_quantiles`
    interpolation, whose staged float expression the oracle replays
    verbatim per window (the ``quantile_sketch_quantity`` convention,
    windowed) — so the approximate quantiles compare bit-exact, proving
    the sketch machinery rather than an estimate tolerance. Null values
    are excluded on both engines; out-of-range values clip into the
    boundary bins identically (LEAST/GREATEST mirror)."""
    from xmlschema_ray.engine.stats import histogram_quantiles
    from xmlschema_ray.ops.relational import combiner_aggregate, to_pandas_with_schema
    from xmlschema_ray.pipelines.common import cents

    day_us = np.int64(86_400_000_000)
    edges = np.arange(0.0, (_RQS_BINS + 1) * _RQS_WIDTH_C, _RQS_WIDTH_C, dtype=np.float64)
    ds = rd.read_parquet(table_path(sf_dir, "events"), columns=["ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "window_end_day": pd.Series([], dtype="int64"),
                "bin": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        ok = batch["value"].notna().to_numpy()
        if not ok.any():
            return empty
        day = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // day_us
        ).astype(np.int64)[ok]
        c = cents(batch["value"].to_numpy()[ok])
        b = np.clip(c // _RQS_WIDTH_C, 0, _RQS_BINS - 1)
        g = (
            pd.DataFrame({"day": day, "bin": b})
            .groupby(["day", "bin"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        frames = [
            pd.DataFrame(
                {
                    "window_end_day": g["day"].to_numpy(np.int64) + o,
                    "bin": g["bin"].to_numpy(np.int64),
                    "n": g["n"].to_numpy(np.int64),
                }
            )
            for o in range(window_days)
        ]
        return pd.concat(frames, ignore_index=True)

    cells = to_pandas_with_schema(
        combiner_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            ["window_end_day", "bin"],
            {"n": ("n", "sum")},
        )
    )
    rows = []
    for w, g in cells.groupby("window_end_day", sort=True):
        hist = np.zeros(_RQS_BINS, dtype=np.int64)
        hist[g["bin"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        qs = histogram_quantiles(hist, edges, qs=(0.5, 0.95))
        rows.append(
            {
                "window_end_day": np.int64(w),
                "n_events": np.int64(hist.sum()),
                "p50_c": qs["p50"],
                "p95_c": qs["p95"],
            }
        )
    return pd.DataFrame(rows).astype({"window_end_day": "int64", "n_events": "int64"})


ROLLING_QUANTILE_SKETCH_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         LEAST(GREATEST(CAST(floor(value * 100 + 0.5) AS BIGINT) // {_RQS_WIDTH_C}, 0),
               {_RQS_BINS - 1}) AS b
  FROM events WHERE value IS NOT NULL
), w AS (
  SELECT day + o AS wd, b FROM e, (VALUES (0), (1), (2), (3), (4), (5), (6)) AS offs(o)
), h AS (
  SELECT wd, b, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1, 2
), g AS (
  SELECT wds.wd, r.range AS b, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
  FROM (SELECT DISTINCT wd FROM h) wds CROSS JOIN range(0, {_RQS_BINS}) r
  LEFT JOIN h ON h.wd = wds.wd AND h.b = r.range
), c AS (
  SELECT wd, b, n,
    CAST(SUM(n) OVER (PARTITION BY wd ORDER BY b) AS BIGINT) AS cum,
    CAST(SUM(n) OVER (PARTITION BY wd) AS BIGINT) AS total
  FROM g
), qv AS (
  SELECT * FROM (VALUES ('p50', 0.5), ('p95', 0.95)) t(lbl, q)
), pick AS (
  SELECT c.wd, qv.lbl, qv.q, MIN(c.b) AS i
  FROM qv JOIN c ON CAST(c.cum AS DOUBLE) >= qv.q * CAST(c.total AS DOUBLE)
  GROUP BY 1, 2, 3
), vals AS (
  SELECT p.wd, p.lbl,
    CAST(c.b * {_RQS_WIDTH_C} AS DOUBLE)
      + ((p.q * CAST(c.total AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.n AS DOUBLE)))
         / CAST(c.n AS DOUBLE)) * {_RQS_WIDTH_C}.0 AS v
  FROM pick p JOIN c ON c.wd = p.wd AND c.b = p.i
)
SELECT t.wd AS window_end_day,
       CAST(t.total AS BIGINT) AS n_events,
       MAX(CASE WHEN lbl = 'p50' THEN v END) AS p50_c,
       MAX(CASE WHEN lbl = 'p95' THEN v END) AS p95_c
FROM (SELECT DISTINCT wd, total FROM c) t JOIN vals ON vals.wd = t.wd
GROUP BY 1, 2 ORDER BY 1
"""


# register replay in pure string algebra (the hll_vocab_by_source
# convention at p=12): bucket = top 3 hex chars, rank = 4·(leading zero
# nibbles of the 13-char remainder) + intra-nibble zeros + 1, cap 53.
HLL_SLIDING_WINDOW_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
), w AS (
  SELECT day + o AS window_end_day, user_id
  FROM du, (VALUES (0), (1), (2), (3), (4), (5), (6)) AS offs(o)
), h AS (
  SELECT DISTINCT window_end_day, md5(CAST(user_id AS VARCHAR)) AS x FROM w
), b AS (
  SELECT window_end_day,
    CAST((strpos('0123456789abcdef', substring(x, 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substring(x, 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substring(x, 3, 1)) - 1) AS BIGINT) AS bucket,
    length(regexp_extract(substring(x, 4, 13), '^0*')) AS z,
    substring(x, 4 + length(regexp_extract(substring(x, 4, 13), '^0*')), 1) AS c
  FROM h
), r AS (
  SELECT window_end_day, bucket,
    CAST(CASE WHEN z = 13 THEN 53
         ELSE 4 * z + (CASE WHEN c = '1' THEN 3
                            WHEN c IN ('2', '3') THEN 2
                            WHEN c IN ('4', '5', '6', '7') THEN 1
                            ELSE 0 END) + 1
    END AS BIGINT) AS rank
  FROM b
)
SELECT window_end_day, bucket, MAX(rank) AS rank
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "hll_sliding_window_users": hll_sliding_window_users,
    "event_activity_islands": event_activity_islands,
    "rolling_value_quantile_sketch": rolling_value_quantile_sketch,
    "pareto_orders": pareto_orders,
    "peak_concurrent_sessions": peak_concurrent_sessions,
    "events_daily_gapfill": events_daily_gapfill,
    "part_pagerank": part_pagerank,
    "part_reach_hops": part_reach_hops,
    "logreg_train_orders": logreg_train_orders,
    "session_window_overlap": session_window_overlap,
    "auc_urgent_price": auc_urgent_price,
    "part_kcore": part_kcore,
    "part_sssp": part_sssp,
    "benford_price_audit": benford_price_audit,
    "k_anonymity_audit": k_anonymity_audit,
    "gini_revenue_concentration": gini_revenue_concentration,
    "seasonal_decompose_daily": seasonal_decompose_daily,
}

ORACLES = {
    "hll_sliding_window_users": HLL_SLIDING_WINDOW_SQL,
    "event_activity_islands": EVENT_ACTIVITY_ISLANDS_SQL,
    "rolling_value_quantile_sketch": ROLLING_QUANTILE_SKETCH_SQL,
    "benford_price_audit": BENFORD_PRICE_SQL,
    "k_anonymity_audit": K_ANONYMITY_SQL,
    "gini_revenue_concentration": GINI_REVENUE_SQL,
    "seasonal_decompose_daily": SEASONAL_DECOMPOSE_SQL,
    "pareto_orders": PARETO_ORDERS_SQL,
    "peak_concurrent_sessions": PEAK_CONCURRENT_SQL,
    "events_daily_gapfill": EVENTS_GAPFILL_SQL,
    "part_pagerank": PART_PAGERANK_SQL,
    "part_reach_hops": PART_REACH_HOPS_SQL,
    "logreg_train_orders": LOGREG_TRAIN_SQL,
    "session_window_overlap": SESSION_WINDOW_OVERLAP_SQL,
    "auc_urgent_price": AUC_URGENT_PRICE_SQL,
    "part_kcore": PART_KCORE_SQL,
    "part_sssp": PART_SSSP_SQL,
}
