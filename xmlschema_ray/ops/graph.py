"""Connected components over candidate-pair edges.

Dedup clustering needs components of the verified near-dup pair graph
(ray_guide near-dup pattern: "connected components — iterate a few rounds
of min-label propagation with groupby, or union-find on the driver only if
the candidate set is provably small").

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

import ray
import ray.data as rd

from xmlschema_ray.ops.relational import combiner_aggregate


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
