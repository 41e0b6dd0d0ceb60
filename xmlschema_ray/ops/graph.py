"""Connected components over candidate-pair edges.

Dedup clustering needs components of the verified near-dup pair graph.
Tiering rationale: union-find on the driver is exact and O(pairs α) but
only when the pair set is provably small; past that, a few rounds of
min-label propagation (each a bounded groupby over edge endpoints)
converge in O(diameter) rounds; past broadcastable node counts the labels
themselves must stay a Dataset (bucketed joins + pointer jumping).

* ``union_find`` — driver-side, for small pair sets.
* ``connected_components_distributed`` — iterative min-label propagation:
  each round, every node's label becomes the min over its own and its
  neighbors' labels (a combiner aggregate per round — no per-node Python);
  converges in O(diameter) rounds. Labels are broadcast per round
  (``ray.put``); for node sets beyond broadcast size the same loop runs
  with ``Dataset.join`` instead — the partitioning assumption is only that
  the edge list hash-partitions by node.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from xmlschema_ray.ops.relational import combiner_aggregate, hash_bucket_join


def union_find(nodes: Iterable[int], pairs: Iterable[Tuple[int, int]]) -> Dict[int, int]:
    parent = {int(n): int(n) for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components_distributed(
    edges: rd.Dataset, nodes: np.ndarray, max_rounds: int = 20
) -> pd.DataFrame:
    """(node, root) labels via min-label propagation over a Ray edge set.

    ``edges`` has int64 columns ``a``/``b``; ``nodes`` is the full node id
    array (isolated nodes keep their own label).
    """
    labels = pd.Series(nodes.astype(np.int64), index=nodes.astype(np.int64))
    for _ in range(max_rounds):
        lab_ref = ray.put(labels)
        state: dict = {}

        def propose(batch: pd.DataFrame) -> pd.DataFrame:
            lab = state.get("l")
            if lab is None:
                lab = state["l"] = ray.get(lab_ref)
            la = lab.loc[batch["a"]].to_numpy()
            lb = lab.loc[batch["b"]].to_numpy()
            m = np.minimum(la, lb)
            # each endpoint proposes the pair's min label
            return pd.DataFrame(
                {
                    "node": np.concatenate([batch["a"].to_numpy(), batch["b"].to_numpy()]),
                    "prop": np.concatenate([m, m]),
                }
            )

        proposals = combiner_aggregate(
            edges.map_batches(propose, batch_format="pandas"),
            keys="node",
            aggs={"prop": ("prop", "min")},
            num_partitions=8,
        ).to_pandas()
        new_labels = labels.copy()
        upd = proposals.set_index("node")["prop"]
        merged = np.minimum(new_labels.loc[upd.index].to_numpy(), upd.to_numpy())
        changed = int((merged != new_labels.loc[upd.index].to_numpy()).sum())
        new_labels.loc[upd.index] = merged
        labels = new_labels
        # pointer-jumping shortcut (label[x] <- label[label[x]]): collapses
        # long chains so convergence is O(log diameter) distributed rounds
        # instead of O(diameter)
        while True:
            jumped = np.minimum(labels.to_numpy(), labels.loc[labels.to_numpy()].to_numpy())
            if (jumped == labels.to_numpy()).all():
                break
            labels = pd.Series(jumped, index=labels.index)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing) — raise max_rounds"
        )
    return pd.DataFrame({"node": labels.index.to_numpy(), "root": labels.to_numpy()})


def connected_components_joined(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    max_rounds: int = 50,
    num_partitions: int = 32,
) -> rd.Dataset:
    """(node, root) labels with the label table kept DISTRIBUTED — the
    beyond-broadcast path: per round the driver touches only one int64
    scalar, never the labels.

    ``edges`` has int64 columns ``a``/``b``; ``nodes`` one int64 column
    ``node``. Each round: (1) every node proposes the min label over its
    neighborhood via a bucketed edge⋈label join + combiner-min, (2) one
    pointer-jumping self-join (``label[x] <- label[label[x]]``) collapses
    chains so convergence is O(log diameter) rounds, (3) convergence is
    detected from the total label sum — labels only ever decrease, so an
    unchanged sum means a fixpoint. Partitioning assumption: edges and
    labels hash-partition by node id (the same guarantee every bucketed
    join here relies on).
    """
    labels = nodes.map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t["node"], pa.int64()), "label": pc.cast(t["node"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    und = edges.map_batches(
        lambda t: pa.table(
            {
                "s": pa.concat_arrays(
                    [pc.cast(t["a"], pa.int64()).combine_chunks(), pc.cast(t["b"], pa.int64()).combine_chunks()]
                ),
                "t": pa.concat_arrays(
                    [pc.cast(t["b"], pa.int64()).combine_chunks(), pc.cast(t["a"], pa.int64()).combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if und.count() == 0:
        return labels.map_batches(
            lambda t: t.rename_columns(["node", "root"]), batch_format="pyarrow"
        )

    total = labels.sum("label")
    for _ in range(max_rounds):
        # neighbor proposals: edge (s, t) ships t's current label to s
        nb = hash_bucket_join(
            und,
            labels.map_batches(
                lambda t: t.rename_columns(["t_node", "label"]), batch_format="pyarrow"
            ),
            "t",
            "t_node",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.select(["s", "label"]).rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
        merged = combiner_aggregate(
            labels.union(nb),
            keys="node",
            aggs={"label": ("label", "min")},
            num_partitions=num_partitions,
        ).materialize()
        # materialized: merged feeds BOTH sides of the pointer-jump
        # self-join below — lazy, the whole neighbor-join + combiner
        # pipeline would re-execute twice per round
        # pointer jump: label[x] <- label[label[x]] (labels are monotone,
        # label[x] <= x, so the jumped label can only be <=)
        jumped = hash_bucket_join(
            merged,
            merged.map_batches(
                lambda t: t.rename_columns(["j_node", "j_label"]), batch_format="pyarrow"
            ),
            "label",
            "j_node",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"], "label": pc.min_element_wise(t["label"], t["j_label"])}
            ),
            batch_format="pyarrow",
        )
        labels = jumped.materialize()
        new_total = labels.sum("label")
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components_joined did not converge in {max_rounds} rounds — raise max_rounds"
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "root"]), batch_format="pyarrow"
    )
