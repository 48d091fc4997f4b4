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


def _shard_of(nodes, k: int) -> np.ndarray:
    # Arrow-native node hash (_hashing family): type-stable — a pandas
    # hash would shard the same node id differently if its column ever
    # floated (one null in a block floats int64 in pandas)
    from .._hashing import hash_columns

    arr = pa.array(np.asarray(nodes, dtype=np.int64), pa.int64())
    return (hash_columns(pa.table({"n": arr}), ["n"]) % k).astype(np.int64)


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

    from ..shuffle import refs_total_bytes, shards_for_bytes

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # shuffle.py sizing rule: parallelism floor, bytes-derived growth
    k = num_shards or shards_for_bytes(
        refs_total_bytes(refs), max(2, min(cpus, len(refs) * 2, 32)))

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

    from ..shuffle import refs_total_bytes, shards_for_bytes

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # shuffle.py sizing rule: parallelism floor, bytes-derived growth
    k = num_shards or shards_for_bytes(
        refs_total_bytes(refs), max(2, min(cpus, len(refs) * 2, 32)))

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


def _tri_canon(src: str, dst: str, *tables):
    """Canonical undirected edges: (a, b) = (min, max), self-loops out."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    t = pa.concat_tables(live, promote_options="default")
    u = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    df = pd.DataFrame({"a": np.minimum(u, v),
                       "b": np.maximum(u, v)}).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def _tri_distinct(t: pa.Table) -> pa.Table:
    return t.group_by(["a", "b"]).aggregate([])


def _tri_deg_partial(t):
    if t is None or not t.num_rows:
        return None
    a = t["a"].to_numpy()
    vc = pd.Series(np.concatenate([a, t["b"].to_numpy()])).value_counts()
    return pa.table({"node": vc.index.to_numpy().astype(np.int64),
                     "deg": vc.to_numpy().astype(np.int64)})


def _tri_tag_edges(which: str, t):
    """Edge rows keyed on one endpoint, ready to union with deg rows."""
    if t is None or not t.num_rows:
        return None
    cols = {"k": t[which], "a": t["a"], "b": t["b"]}
    if "deg_a" in t.column_names:
        cols["deg_a"] = t["deg_a"]
    else:
        cols["deg_a"] = pa.nulls(t.num_rows, pa.int64())
    cols["deg"] = pa.nulls(t.num_rows, pa.int64())
    cols["side"] = pa.array(np.zeros(t.num_rows, np.int8))
    return pa.table(cols)


def _tri_tag_degs(t):
    if t is None or not t.num_rows:
        return None
    n = t.num_rows
    return pa.table({
        "k": t["node"], "a": pa.nulls(n, pa.int64()),
        "b": pa.nulls(n, pa.int64()), "deg_a": pa.nulls(n, pa.int64()),
        "deg": t["deg"], "side": pa.array(np.ones(n, np.int8)),
    })


def _tri_attach(out_col: str, t: pa.Table):
    """Within a k-shard: map each edge row's k-endpoint degree on."""
    df = t.to_pandas()
    deg = df[df["side"] == 1].set_index("k")["deg"]
    e = df[df["side"] == 0]
    if not len(e):
        return None
    out = pd.DataFrame({"a": e["a"].to_numpy(np.int64),
                        "b": e["b"].to_numpy(np.int64)})
    if "deg_a" in e and e["deg_a"].notna().any():
        out["deg_a"] = e["deg_a"].to_numpy(np.int64)
    out[out_col] = e["k"].map(deg).to_numpy(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _tri_orient(t):
    """Orient each canonical edge from its lower-(degree, id) endpoint —
    the classic bound that keeps per-node out-degree O(sqrt(m))."""
    if t is None or not t.num_rows:
        return None
    a, b = t["a"].to_numpy(), t["b"].to_numpy()
    da, db = t["deg_a"].to_numpy(), t["deg_b"].to_numpy()
    swap = db < da  # tie keeps (a, b): a < b canonically
    return pa.table({"u": np.where(swap, b, a), "v": np.where(swap, a, b)})


def _run_pairs(new: np.ndarray):
    """All (i1, i2) index pairs with i1 < i2 inside each run of a
    sorted group column; `new` marks run starts. Vectorized run-length
    index arithmetic shared by the wedge and clique kernels. Returns
    None when no run has two members."""
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(new)))
    ends = np.repeat(starts + sizes, sizes)
    idx = np.arange(len(new))
    reps = ends - idx - 1
    total = int(reps.sum())
    if not total:
        return None
    i1 = np.repeat(idx, reps)
    run_starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
    i2 = i1 + (np.arange(total) - np.repeat(run_starts, reps) + 1)
    return i1, i2


def _tri_wedges(t: pa.Table):
    """All out-neighbor pairs per u (sharded by u): wedge (x, y, center)
    with (x, y) id-canonical for the edge-set match."""
    df = t.to_pandas().sort_values(["u", "v"], kind="mergesort")
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    new = np.ones(len(u), bool)
    new[1:] = u[1:] != u[:-1]
    pairs = _run_pairs(new)
    if pairs is None:
        return None
    i1, i2 = pairs
    return pa.table({"x": np.minimum(v[i1], v[i2]),
                     "y": np.maximum(v[i1], v[i2]), "c": u[i1]})


def _tri_tag_wedges(t):
    if t is None or not t.num_rows:
        return None
    return t.append_column("side", pa.array(np.zeros(t.num_rows, np.int8)))


def _tri_tag_match_edges(t):
    if t is None or not t.num_rows:
        return None
    n = t.num_rows
    return pa.table({"x": t["a"], "y": t["b"],
                     "c": pa.nulls(n, pa.int64()),
                     "side": pa.array(np.ones(n, np.int8))})


def _tri_match(t: pa.Table):
    """Matched wedge == closed triangle; emit pre-summed per-node +1s
    for all three corners."""
    df = t.to_pandas()
    e = df[df["side"] == 1][["x", "y"]]
    w = df[df["side"] == 0]
    if not len(e) or not len(w):
        return None
    m = w.merge(e, on=["x", "y"], how="inner")
    if not len(m):
        return None
    vc = pd.Series(np.concatenate(
        [m["x"].to_numpy(np.int64), m["y"].to_numpy(np.int64),
         m["c"].to_numpy(np.int64)])).value_counts()
    return pa.table({"node": vc.index.to_numpy().astype(np.int64),
                     "n": vc.to_numpy().astype(np.int64)})


def triangle_counts(
    edges,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    tri_out: str = "triangles",
) -> pa.Table:
    """Per-node triangle participation counts over an undirected simple
    graph given as a (possibly duplicated, possibly both-orientation)
    edge list — the clustering-coefficient numerator and the standard
    graph-quality signal.

    The MapReduce node-iterator with DEGREE ORIENTATION (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11 —
    public algorithm, re-expressed as Ray object-store exchanges):
    canonical-dedup the edges, attach both endpoint degrees (two keyed
    exchanges of fixed-width rows), orient each edge from its lower
    (deg, id) endpoint so per-node out-degree is O(sqrt(m)), generate
    out-neighbor wedges per source (one exchange), close them against
    the canonical edge set co-located by (x, y) hash (one exchange), and
    sum per-corner +1s (final reduce). Every stage ships fixed-width
    int64 rows; nothing corpus-sized touches the driver. Each triangle
    is generated exactly once (at its lowest-(deg,id) corner), so
    sum(counts) == 3 x global triangle count.
    """
    import ray

    from ..shuffle import hash_exchange

    if hasattr(edges, "to_arrow_refs"):
        refs = edges.to_arrow_refs()
    elif isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    else:
        refs = list(edges)
    empty = pa.table({node_out: pa.array([], pa.int64()),
                      tri_out: pa.array([], pa.int64())})
    if not refs:
        return empty

    canon = ray.remote(_tri_canon)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_map = max(1, min(len(refs), 2 * cpus))
    chunk = (len(refs) + n_map - 1) // n_map
    canon_refs = [canon.remote(src, dst, *refs[i : i + chunk])
                  for i in range(0, len(refs), chunk)]
    e_refs = hash_exchange(canon_refs, ["a", "b"], _tri_distinct,
                           combine_fn=_tri_distinct, return_refs=True)

    deg_partial = ray.remote(_tri_deg_partial)
    d_refs = hash_exchange([deg_partial.remote(r) for r in e_refs],
                           ["node"],
                           lambda t: t.group_by(["node"]).aggregate(
                               [("deg", "sum")]).rename_columns(
                               ["node", "deg"]),
                           return_refs=True)

    tag_e = ray.remote(_tri_tag_edges)
    tag_d = ray.remote(_tri_tag_degs)
    from functools import partial as _part

    a1 = hash_exchange(
        [tag_e.remote("a", r) for r in e_refs]
        + [tag_d.remote(r) for r in d_refs],
        ["k"], _part(_tri_attach, "deg_a"), return_refs=True)
    a2 = hash_exchange(
        [tag_e.remote("b", r) for r in a1]
        + [tag_d.remote(r) for r in d_refs],
        ["k"], _part(_tri_attach, "deg_b"), return_refs=True)

    orient = ray.remote(_tri_orient)
    o_refs = [orient.remote(r) for r in a2]
    w_refs = hash_exchange(o_refs, ["u"], _tri_wedges, return_refs=True)

    tag_w = ray.remote(_tri_tag_wedges)
    tag_me = ray.remote(_tri_tag_match_edges)
    parts = hash_exchange(
        [tag_w.remote(r) for r in w_refs]
        + [tag_me.remote(r) for r in e_refs],
        ["x", "y"], _tri_match, return_refs=True)

    out = hash_exchange(
        parts, ["node"],
        lambda t: t.group_by(["node"]).aggregate(
            [("n", "sum")]).rename_columns(["node", "n"]))
    if out is None or not out.num_rows:
        return empty
    return out.rename_columns([node_out, tri_out])


def _clique_pairs(key_col: str, id_col: str, t: pa.Table):
    """All within-group id pairs (a < b), vectorized run-length style."""
    df = t.to_pandas().drop_duplicates([key_col, id_col]).sort_values(
        [key_col, id_col], kind="mergesort")
    k = df[key_col].to_numpy()
    v = df[id_col].to_numpy().astype(np.int64)
    new = np.ones(len(k), bool)
    new[1:] = k[1:] != k[:-1]
    pairs = _run_pairs(new)
    if pairs is None:
        return None
    i1, i2 = pairs
    return pa.table({"src": v[i1], "dst": v[i2]})


def clique_edges(ds, key_col: str, id_col: str):
    """Project a (key, id) grouping into its within-group clique edge
    list (a < b): the standard blocking->pair-graph step before
    similarity verification or graph analytics. ONE key-hash exchange
    co-locates each group; pair generation is run-length index
    arithmetic, never a per-group Python loop. O(g^2) pairs per group —
    callers bound the group size via the blocking key (e.g. include a
    length bucket), same contract as the LSH band buckets in
    ops/dedup.py. Returns per-shard Arrow refs for chaining."""
    from functools import partial as _part

    from ..shuffle import hash_exchange

    return hash_exchange(
        ds.select_columns([key_col, id_col]).to_arrow_refs(),
        [key_col], _part(_clique_pairs, key_col, id_col),
        return_refs=True)


# --------------------------------------------------------- BFS layers

def _bfs_init(seeds: np.ndarray, adj: Optional[pa.Table]):
    """dist=0 rows for the seeds owned by this shard (a seed lives in the
    shard that owns its adjacency rows). Returns (dists, frontier)."""
    if adj is None or adj.num_rows == 0:
        return None, None
    u = np.unique(adj["u"].to_numpy(zero_copy_only=False))
    present = np.intersect1d(u, np.asarray(seeds, dtype=np.int64))
    if not len(present):
        return None, None
    t = pa.table({"node": pa.array(present, pa.int64()),
                  "d": pa.array(np.zeros(len(present), np.int64))})
    return t, t


def _bfs_msgs(k: int, adj: Optional[pa.Table],
              frontier: Optional[pa.Table]):
    """Messages (v, d(u)+1) from LAST ROUND'S FRONTIER only — settled
    nodes never re-send, so total message volume across the whole run is
    O(E), not O(E * diameter)."""
    empty = [None] * k if k > 1 else None
    if adj is None or frontier is None or frontier.num_rows == 0:
        return empty
    df = adj.to_pandas().merge(frontier.to_pandas(), left_on="u",
                               right_on="node", sort=False)
    if not len(df):
        return empty
    df["nd"] = df["d"] + 1
    m = df.groupby("v", sort=False)["nd"].min()  # combine per target
    nodes, ds = m.index.to_series(), m.to_numpy()
    s = _shard_of(nodes, k)
    nodes = nodes.to_numpy()
    out = []
    for i in range(k):
        sel = s == i
        out.append(pa.table({"node": nodes[sel],
                             "d": ds[sel].astype(np.int64)})
                   if sel.any() else None)
    return out if k > 1 else out[0]


def _bfs_update(dists: Optional[pa.Table], *msg_tables):
    """min-merge incoming distances; newly-reached or lowered nodes form
    the next frontier. Returns (dists, frontier, n_changed)."""
    live = [m for m in msg_tables if m is not None and m.num_rows]
    if not live:
        return dists, None, 0
    inc = (pa.concat_tables(live).to_pandas()
           .groupby("node", sort=False)["d"].min())
    if dists is None:
        t = pa.table({"node": inc.index.to_numpy(),
                      "d": inc.to_numpy().astype(np.int64)})
        return t, t, t.num_rows
    old = dists.to_pandas().set_index("node")["d"]
    merged = pd.concat([old, inc]).groupby(level=0).min()
    oldr = old.reindex(merged.index)
    lowered = merged < oldr.fillna(np.inf)
    changed_idx = merged.index[lowered.to_numpy()]
    if not len(changed_idx):
        return dists, None, 0
    t = pa.table({"node": merged.index.to_numpy(),
                  "d": merged.to_numpy().astype(np.int64)})
    f = pa.table({"node": changed_idx.to_numpy(),
                  "d": merged.loc[changed_idx].to_numpy().astype(np.int64)})
    return t, f, int(len(changed_idx))


def bfs_layers(
    edges,
    seeds,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    dist_out: str = "dist",
    num_shards: Optional[int] = None,
    max_rounds: int = 64,
) -> pa.Table:
    """Multi-source BFS hop distance over an undirected edge list — the
    frontier-expansion sibling of `connected_components` on the SAME
    aligned-shard scaffolding (seed-set expansion: "everything within N
    hops of these docs/users"). Per round only the nodes whose distance
    changed last round send (dist+1) messages to their neighbors' shards,
    so total traffic is O(E) fixed-width int64 rows over the whole run
    and rounds = max reached distance. Output covers exactly the nodes
    reachable from the seeds through the edge list (a seed absent from
    the graph is absent from the output — the documented contract; the
    SQL recursive twin keeps in-graph seeds only too)."""
    import ray

    if hasattr(edges, "to_arrow_refs"):
        refs = edges.to_arrow_refs()
    elif isinstance(edges, pa.Table):
        refs = [ray.put(edges)]
    else:
        refs = list(edges)
    empty = pa.table({node_out: pa.array([], pa.int64()),
                      dist_out: pa.array([], pa.int64())})
    if not refs:
        return empty
    seeds = np.asarray(list(seeds), dtype=np.int64)

    from ..shuffle import refs_total_bytes, shards_for_bytes

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # shuffle.py sizing rule: parallelism floor, bytes-derived growth
    k = num_shards or shards_for_bytes(
        refs_total_bytes(refs), max(2, min(cpus, len(refs) * 2, 32)))

    build = ray.remote(num_returns=k)(_build_adj)
    merge = ray.remote(_merge_adj)
    init = ray.remote(num_returns=2)(_bfs_init)
    gen = ray.remote(num_returns=k)(_bfs_msgs)
    upd = ray.remote(num_returns=3)(_bfs_update)

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
    dists, frontier = [], []
    for a in adj:
        d, f = init.remote(seeds, a)
        dists.append(d)
        frontier.append(f)

    for _ in range(max_rounds):
        msgs = [gen.remote(k, adj[s], frontier[s]) for s in range(k)]
        if k == 1:
            msgs = [[m] for m in msgs]
        changed_refs = []
        for t in range(k):
            dists[t], frontier[t], ch = upd.remote(
                dists[t], *[msgs[s][t] for s in range(k)])
            changed_refs.append(ch)
        if sum(ray.get(changed_refs)) == 0:
            break

    live = [t for t in ray.get(dists) if t is not None and t.num_rows]
    if not live:
        return empty
    return pa.concat_tables(live).rename_columns([node_out, dist_out])
