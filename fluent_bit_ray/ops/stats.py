"""Distributed exact keyed quantiles.

The reference's only numeric summaries are count/bytes totals
(`plugins/out_flowcounter/out_flowcounter.c` — studied, not copied); a
telemetry engine also needs latency/value percentiles per key. Exact
quantiles are not decomposable into per-batch partials, so this is a real
co-locating exchange: prune to (key, value) fixed-width pairs at the read,
hash-exchange on the key, and compute every key's quantiles inside one
vectorized pandas body per shard.

Partitioning assumption (documented): one KEY's values fit a reduce shard
(per-category metric distributions — the usual case). For keys whose value
lists exceed a shard, the scale path is an approximate sketch (t-digest /
fixed-bin histogram merged as partials); this operator is the exact
oracle-checkable form.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import hash_exchange


def keyed_quantiles(
    ds,
    key_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    names: Sequence[str] = ("p50", "p95", "p99"),
) -> Optional[pa.Table]:
    """Per key: exact linear-interpolated quantiles of `value_col` (the
    SQL `quantile_cont` / numpy 'linear' definition), nulls ignored."""
    qlist = list(qs)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df[value_col].notna()]
        keys_out = []
        rows = []
        # vectorized within each key: one np.quantile call computes all
        # requested quantiles over the key's sorted values at C speed;
        # the Python loop is over DISTINCT KEYS in the shard, not rows
        for key, g in df.groupby(key_col, sort=False, dropna=False):
            keys_out.append(key)
            rows.append(np.quantile(g[value_col].to_numpy(), qlist,
                                    method="linear"))
        mat = np.asarray(rows, dtype=np.float64).reshape(len(rows), len(qlist))
        out = {key_col: keys_out}
        for j, name in enumerate(names):
            out[name] = mat[:, j]
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    pruned = ds.select_columns([key_col, value_col])
    return hash_exchange(pruned.to_arrow_refs(), [key_col], finish)
