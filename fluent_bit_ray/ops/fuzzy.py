"""Blocked edit-distance (Levenshtein) self-join.

Fuzzy matching of short strings — URL/title/prefix variants that minhash
shingles are too coarse for. The reference engine has no fuzzy matcher
(its closest notion is wildcard tag matching, `src/flb_router.c` — studied,
not copied); this is the classic similarity-join shape: a LOSSLESS
blocking exchange, then a batch-vectorized verification kernel.

Blocking: |len(a) - len(b)| <= t is implied by lev(a, b) <= t, so rows
are replicated to their byte-length band ``len // band`` and the next
band (band >= t), which guarantees every qualifying pair co-locates while
each pair is VERIFIED in exactly one shard (the one keyed by the pair's
larger original band). Partitioning assumption (documented): length
banding distributes only when lengths vary — a corpus of constant-length
keys concentrates into one band, and near-constant-length corpora should
use the minhash/LSH path (ops/dedup.py) or a PassJoin-style segment
index instead. Distances are over UTF-8 BYTES, matching DuckDB/Postgres
``levenshtein()``.

The verifier is a DP over byte positions VECTORIZED ACROSS PAIRS: each
of the O(Lmax^2 / Lmax) = O(Lmax) row steps updates all P candidate
pairs at once, with the insertion dependency resolved by the
``min-accumulate(cur - j) + j`` prefix trick, so there is no per-pair
Python loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import hash_exchange


def levenshtein_pairs(a: list, b: list) -> np.ndarray:
    """Byte-level Levenshtein distance for each (a[i], b[i]) pair,
    vectorized across the pair axis (one DP row step = one numpy op
    over all pairs)."""
    P = len(a)
    if not P:
        return np.zeros(0, dtype=np.int64)
    ab = [s.encode("utf-8") for s in a]
    bb = [s.encode("utf-8") for s in b]
    la = np.fromiter((len(s) for s in ab), np.int64, P)
    lb = np.fromiter((len(s) for s in bb), np.int64, P)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    # padded byte matrices; pads never equal a real byte (>255 sentinel)
    A = np.full((P, max(La, 1)), 256, np.int16)
    B = np.full((P, max(Lb, 1)), 257, np.int16)
    for i, s in enumerate(ab):
        A[i, : len(s)] = np.frombuffer(s, np.uint8)
    for i, s in enumerate(bb):
        B[i, : len(s)] = np.frombuffer(s, np.uint8)

    ar = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (P, Lb + 1)).copy()
    res = np.where(la == 0, lb, -1)
    for i in range(1, La + 1):
        eq = A[:, i - 1 : i] == B[:, :Lb]
        cur = np.empty((P, Lb + 1), np.int64)
        cur[:, 0] = i
        np.minimum(prev[:, :-1] + (~eq), prev[:, 1:] + 1, out=cur[:, 1:])
        # insertions: cur[j] = min_{k<=j}(cur[k] + (j-k))
        cur = np.minimum.accumulate(cur - ar, axis=1) + ar
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res


def _fuzzy_shard(id_col: str, str_col: str, max_dist: int,
                 t: pa.Table) -> Optional[pa.Table]:
    """One band shard: length-windowed candidate pairs, then the
    vectorized DP verify. Rows carry (band key, original band)."""
    df = t.to_pandas()
    # group by the replicated band key; composite (key, len) sort makes
    # one global searchsorted produce each row's candidate window
    codes = pd.factorize(df["_band"], use_na_sentinel=False)[0]
    blen = df["_blen"].to_numpy(np.int64)
    order = np.lexsort((df[id_col].to_numpy(), blen, codes))
    codes, blen = codes[order], blen[order]
    ids = df[id_col].to_numpy()[order]
    orig = df["_orig"].to_numpy(np.int64)[order]
    band = df["_band"].to_numpy(np.int64)[order]
    strs = df[str_col].to_numpy()[order]

    big = int(blen.max(initial=0)) + max_dist + 2
    comp = codes * big + blen
    upper = np.searchsorted(comp, comp + max_dist, side="right")
    idx = np.arange(len(comp))
    reps = upper - idx - 1
    total = int(reps.sum())
    if not total:
        return None
    i1 = np.repeat(idx, reps)
    run_starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
    i2 = i1 + (np.arange(total) - np.repeat(run_starts, reps) + 1)
    # verify each pair exactly once: in the shard keyed by its larger
    # original band (rows are replicated to bands b and b+1)
    keep = np.maximum(orig[i1], orig[i2]) == band[i1]
    keep &= ids[i1] != ids[i2]
    i1, i2 = i1[keep], i2[keep]
    if not len(i1):
        return None
    d = levenshtein_pairs(list(strs[i1]), list(strs[i2]))
    hit = d <= max_dist
    if not hit.any():
        return None
    a, b = ids[i1[hit]], ids[i2[hit]]
    return pa.table({
        "id_a": np.minimum(a, b).astype(np.int64),
        "id_b": np.maximum(a, b).astype(np.int64),
        "dist": d[hit],
    })


def fuzzy_self_join(
    ds,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """All distinct id pairs whose strings are within `max_dist`
    byte-level edit distance (id_a < id_b, plus the distance) — SQL
    ``a JOIN b ON levenshtein(a.s, b.s) <= t AND a.id < b.id`` without
    the quadratic cross join: ONE exchange on the length band (each row
    shipped twice), candidate windows by length inside each band, and
    the pair-vectorized DP verifier. See the module docstring for the
    lossless-banding argument and the constant-length caveat.
    """
    from functools import partial as _part

    band = max(max_dist, 1)

    def tag(t: pa.Table) -> pa.Table:
        df = t.select([id_col, str_col]).to_pandas().dropna(
            subset=[str_col])
        blen = df[str_col].str.encode("utf-8").str.len().to_numpy(np.int64)
        orig = blen // band
        rep = pd.concat([df, df], ignore_index=True)
        return pa.Table.from_pandas(
            rep.assign(
                _blen=np.concatenate([blen, blen]),
                _orig=np.concatenate([orig, orig]),
                _band=np.concatenate([orig, orig + 1]),
            ),
            preserve_index=False)

    refs = ds.map_batches(tag, batch_format="pyarrow").to_arrow_refs()
    return hash_exchange(refs, ["_band"],
                         _part(_fuzzy_shard, id_col, str_col, max_dist),
                         shard_output_dir=shard_output_dir)
