"""Distributed connected components over an edge list.

The transitive final step of near-duplicate deduplication: LSH banding /
blocked similarity emit candidate PAIRS (ops/dedup.py), but real cluster
assignment needs the transitive closure — doc A ~ B and B ~ C put all
three in ONE cluster even when A and C never paired. The reference engine
has no graph step (its dedup analog stops at per-bucket groups); this is
the published map-reduce "hash-min" label propagation (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds" — the
basic hash-min variant), re-expressed as aligned Ray object-store shards.

Plan (no driver-side graph ever exists):
  1. ONE hash exchange doubles each edge (u,v)->(u,v)+(v,u) and shards the
     adjacency by hash(u); every node also self-loops so isolated nodes
     keep a row.  Labels start as lbl(u) = min(u, min neighbor) computed
     shard-locally in the same pass (a free first round).
  2. Each round, per shard: join labels onto the local adjacency (a C
     pandas hash join), emit messages (v, lbl(u)) sharded by hash(v) —
     labels and adjacency use the SAME single-int64-column pandas hash, so
     a node's label row and its incoming messages always co-locate. The
     update task takes min(old, incoming) per node and reports how many
     labels changed; the driver only ever sees per-shard ints.
  3. Stop when no label changed (convergence = every node holds its
     component's min id) or at `max_rounds`.

Partitioning / scale assumptions: one round ships O(E) fixed-width int64
rows through the object store; rounds needed = graph diameter (hash-min),
and near-dup graphs are hub-shaped (LSH buckets pair members through a
common rep), so diameters stay single-digit — `max_rounds` guards
adversarial chains. A node's label row plus its adjacency rows must fit
the shard; a celebrity node with millions of edges only skews its ONE
adjacency shard (messages still fan out by destination hash).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _shard_of(nodes: pd.Series, k: int) -> np.ndarray:
    # single-column frame so the hash matches everywhere a node id is
    # sharded (column NAME does not participate in hash_pandas_object)
    h = pd.util.hash_pandas_object(nodes, index=False).to_numpy()
    return (h % k).astype(np.int64)


def _build_adj(src: str, dst: str, k: int, *tables):
    """Double the edges, add self-loops, split by hash(u)."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return [None] * k if k > 1 else None
    t = pa.concat_tables(live, promote_options="default")
    u = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    uu = np.concatenate([u, v, nodes])
    vv = np.concatenate([v, u, nodes])
    df = pd.DataFrame({"u": uu, "v": vv}).drop_duplicates()
    s = _shard_of(df["u"], k)
    out = []
    for i in range(k):
        part = df[s == i]
        out.append(pa.table({"u": part["u"].to_numpy(),
                             "v": part["v"].to_numpy()}))
    return out if k > 1 else out[0]


def _merge_adj(*parts):
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        return None
    df = (pa.concat_tables(live).to_pandas().drop_duplicates()
          .reset_index(drop=True))
    return pa.table({"u": df["u"].to_numpy(), "v": df["v"].to_numpy()})


def _init_labels(adj: Optional[pa.Table]) -> Optional[pa.Table]:
    """lbl(u) = min(u, min neighbor) — the free first hash-min round
    (self-loops make min-neighbor include u itself)."""
    if adj is None or adj.num_rows == 0:
        return None
    df = adj.to_pandas()
    lbl = df.groupby("u", sort=False)["v"].min()
    return pa.table({"node": lbl.index.to_numpy(),
                     "lbl": lbl.to_numpy()})


def _gen_msgs(k: int, adj: Optional[pa.Table], labels: Optional[pa.Table]):
    """Messages (v, lbl(u)) for every adjacency row, sharded by hash(v)."""
    empty = [None] * k if k > 1 else None
    if adj is None or labels is None:
        return empty
    df = adj.to_pandas().merge(labels.to_pandas(), left_on="u",
                               right_on="node", sort=False)
    df = df[df["lbl"] < df["v"]]  # a msg >= target id can never lower it
    if not len(df):
        return empty
    m = df.groupby("v", sort=False)["lbl"].min()  # combine per target
    nodes, lbls = m.index.to_series(), m.to_numpy()
    s = _shard_of(nodes, k)
    nodes = nodes.to_numpy()
    out = []
    for i in range(k):
        sel = s == i
        out.append(pa.table({"node": nodes[sel], "lbl": lbls[sel]})
                   if sel.any() else None)
    return out if k > 1 else out[0]


def _update(labels: Optional[pa.Table], *msg_tables):
    """new lbl = min(old, incoming); returns (labels, n_changed)."""
    live = [m for m in msg_tables if m is not None and m.num_rows]
    if labels is None or not live:
        return labels, 0
    old = labels.to_pandas().set_index("node")["lbl"]
    inc = (pa.concat_tables(live).to_pandas()
           .groupby("node", sort=False)["lbl"].min())
    inc = inc.reindex(old.index)
    new = old.where(~(inc < old), inc)  # NaN (no msg) keeps old
    changed = int((new < old).sum())
    if not changed:
        return labels, 0
    return pa.table({"node": new.index.to_numpy(),
                     "lbl": new.to_numpy().astype(np.int64)}), changed


def connected_components(
    edges,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    comp_out: str = "component",
    num_shards: Optional[int] = None,
    max_rounds: int = 64,
) -> pa.Table:
    """Label every node with the smallest node id in its connected
    component (undirected; int64 node ids). `edges` is a `pa.Table`, a
    `ray.data.Dataset`, or a list of Arrow block ObjectRefs (e.g. a
    `hash_exchange(..., return_refs=True)` result) with columns
    `src`/`dst`. Output covers every node that appears in any edge.
    """
    import ray

    if hasattr(edges, "to_arrow_refs"):  # ray Dataset
        refs = edges.to_arrow_refs()
    elif isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    else:
        refs = list(edges)
    if not refs:
        return pa.table({node_out: pa.array([], pa.int64()),
                         comp_out: pa.array([], pa.int64())})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    k = num_shards or max(2, min(cpus, len(refs) * 2, 32))

    build = ray.remote(num_returns=k)(_build_adj)
    merge = ray.remote(_merge_adj)
    init = ray.remote(_init_labels)
    gen = ray.remote(num_returns=k)(_gen_msgs)
    upd = ray.remote(num_returns=2)(_update)

    # one split task per input chunk, then per-shard adjacency merge
    n_split = max(1, min(len(refs), 2 * cpus))
    chunk = (len(refs) + n_split - 1) // n_split
    parts: list[list] = [[] for _ in range(k)]
    for i in range(0, len(refs), chunk):
        outs = build.remote(src, dst, k, *refs[i : i + chunk])
        if k == 1:
            outs = [outs]
        for s, r in enumerate(outs):
            parts[s].append(r)
    adj = [merge.remote(*p) for p in parts]
    labels = [init.remote(a) for a in adj]

    for _ in range(max_rounds):
        msgs = [gen.remote(k, adj[s], labels[s]) for s in range(k)]
        if k == 1:
            msgs = [[m] for m in msgs]
        changed_refs = []
        for t in range(k):
            labels[t], ch = upd.remote(labels[t], *[msgs[s][t] for s in range(k)])
            changed_refs.append(ch)
        if sum(ray.get(changed_refs)) == 0:
            break

    live = [t for t in ray.get(labels) if t is not None and t.num_rows]
    if not live:
        return pa.table({node_out: pa.array([], pa.int64()),
                         comp_out: pa.array([], pa.int64())})
    out = pa.concat_tables(live)
    return out.rename_columns([node_out, comp_out])


def _build_pr(src: str, dst: str, k: int, *tables):
    """Split DISTINCT directed edges by hash(src)."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return [None] * k if k > 1 else None
    t = pa.concat_tables(live, promote_options="default")
    df = pd.DataFrame({
        "src": t[src].to_numpy(zero_copy_only=False).astype(np.int64),
        "dst": t[dst].to_numpy(zero_copy_only=False).astype(np.int64),
    }).drop_duplicates()
    s = _shard_of(df["src"], k)
    out = []
    for i in range(k):
        part = df[s == i]
        out.append(pa.table({"src": part["src"].to_numpy(),
                             "dst": part["dst"].to_numpy()}))
    return out if k > 1 else out[0]


def _pr_adj(*parts):
    """Merge one shard's edge parts; attach out-degree (complete per src
    since the split keys on src)."""
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        return None
    df = pa.concat_tables(live).to_pandas().drop_duplicates()
    df["deg"] = df.groupby("src", sort=False)["src"].transform("size")
    return pa.Table.from_pandas(df, preserve_index=False)


def _pr_nodes(k: int, adj: Optional[pa.Table]):
    """This shard's edges contribute their endpoint ids to the rank
    shards (node set = src ∪ dst, sharded by hash(node))."""
    empty = [None] * k if k > 1 else None
    if adj is None:
        return empty
    nodes = pd.Series(np.unique(np.concatenate(
        [adj["src"].to_numpy(), adj["dst"].to_numpy()])))
    s = _shard_of(nodes, k)
    nodes = nodes.to_numpy()
    out = [pa.table({"node": nodes[s == i]}) for i in range(k)]
    return out if k > 1 else out[0]


def _pr_init(*parts):
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        return None, 0
    nodes = np.unique(np.concatenate([p["node"].to_numpy() for p in live]))
    return (pa.table({"node": nodes,
                      "r": np.ones(len(nodes), dtype=np.float64)}),
            int(len(nodes)))


def _pr_contrib(k: int, adj: Optional[pa.Table],
                ranks: Optional[pa.Table]):
    """(dst, r/deg) per edge, pre-summed per dst, sharded by hash(dst)."""
    empty = [None] * k if k > 1 else None
    if adj is None or ranks is None:
        return empty
    df = adj.to_pandas().merge(ranks.to_pandas(), left_on="src",
                               right_on="node", sort=False)
    m = (df["r"] / df["deg"]).groupby(df["dst"]).sum()
    nodes, vals = m.index.to_series(), m.to_numpy()
    s = _shard_of(nodes, k)
    nodes = nodes.to_numpy()
    out = []
    for i in range(k):
        sel = s == i
        out.append(pa.table({"node": nodes[sel], "c": vals[sel]})
                   if sel.any() else None)
    return out if k > 1 else out[0]


def _pr_update(damping: float, ranks: Optional[pa.Table], *msg_tables):
    if ranks is None:
        return None
    live = [m for m in msg_tables if m is not None and m.num_rows]
    base = 1.0 - damping
    old = ranks.to_pandas()
    if live:
        inc = (pa.concat_tables(live).to_pandas()
               .groupby("node", sort=False)["c"].sum())
        c = old["node"].map(inc).fillna(0.0).to_numpy()
    else:
        c = np.zeros(len(old), dtype=np.float64)
    return pa.table({"node": old["node"].to_numpy(),
                     "r": base + damping * c})


def pagerank(
    edges,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    node_out: str = "node",
    rank_out: str = "rank",
    num_shards: Optional[int] = None,
) -> pa.Table:
    """Fixed-iteration PageRank over a directed edge list (int64 node
    ids), in the UNNORMALIZED form r = (1-d) + d * sum(r_in/deg_out)
    with r0 = 1 — every value is relative to the uniform rank, and the
    recursion is exactly SQL-expressible (a recursive CTE with one
    aggregate per iteration), which is how the driver oracle checks it.
    Dangling nodes (no out-edges) contribute nothing — their mass
    leaks, the classic simple variant; symmetrize the edge list (or add
    self-loops) when that matters.

    Same aligned-shard scaffolding as `connected_components`: adjacency
    sharded ONCE by hash(src) with complete per-src out-degrees; each
    iteration ships per-dst PRE-SUMMED contribution rows (fixed-width
    int64+float64) through one exchange; ranks never leave their shard.
    Exactly `iters` rounds — no driver-side data, only per-shard node
    counts cross to the driver once.
    """
    import ray

    if hasattr(edges, "to_arrow_refs"):
        refs = edges.to_arrow_refs()
    elif isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    else:
        refs = list(edges)
    if not refs:
        return pa.table({node_out: pa.array([], pa.int64()),
                         rank_out: pa.array([], pa.float64())})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    k = num_shards or max(2, min(cpus, len(refs) * 2, 32))

    build = ray.remote(num_returns=k)(_build_pr)
    merge = ray.remote(_pr_adj)
    nodesplit = ray.remote(num_returns=k)(_pr_nodes)
    init = ray.remote(num_returns=2)(_pr_init)
    contrib = ray.remote(num_returns=k)(_pr_contrib)
    update = ray.remote(_pr_update)

    n_split = max(1, min(len(refs), 2 * cpus))
    chunk = (len(refs) + n_split - 1) // n_split
    parts: list[list] = [[] for _ in range(k)]
    for i in range(0, len(refs), chunk):
        outs = build.remote(src, dst, k, *refs[i : i + chunk])
        if k == 1:
            outs = [outs]
        for s, r in enumerate(outs):
            parts[s].append(r)
    adj = [merge.remote(*p) for p in parts]

    nparts: list[list] = [[] for _ in range(k)]
    for s in range(k):
        outs = nodesplit.remote(k, adj[s])
        if k == 1:
            outs = [outs]
        for t, r in enumerate(outs):
            nparts[t].append(r)
    ranks, counts = [], []
    for t in range(k):
        r, c = init.remote(*nparts[t])
        ranks.append(r)
        counts.append(c)
    ray.get(counts)  # materialize the node shards before iterating

    for _ in range(iters):
        msgs = [contrib.remote(k, adj[s], ranks[s]) for s in range(k)]
        if k == 1:
            msgs = [[m] for m in msgs]
        ranks = [update.remote(damping, ranks[t],
                               *[msgs[s][t] for s in range(k)])
                 for t in range(k)]

    live = [t for t in ray.get(ranks) if t is not None and t.num_rows]
    if not live:
        return pa.table({node_out: pa.array([], pa.int64()),
                         rank_out: pa.array([], pa.float64())})
    return pa.concat_tables(live).rename_columns([node_out, rank_out])
