"""Peak-RSS microbench for the tiled SemDeDup component labeling.

Verdict done-criterion (round-3 #2): show the tiled GEMM + union-find
(`ops/cluster._tiled_min_components`) keeps per-shard memory O(tile²)
instead of the dense formulation's O(cluster²) adjacency.

Each measurement runs in a FRESH child interpreter (ru_maxrss is a
process-lifetime high-water mark, so in-process before/after deltas
understate). The child builds an (n, d) unit-vector matrix — the only
O(n) state the algorithm needs — labels components at tau, and prints
its peak RSS. The dense adjacency it avoids would be n² bool + n²
float32 GEMM output (reported for comparison); the tiled path's peak
must stay near the interpreter+input baseline.

Usage:  python tools/semdedup_rss_bench.py [n] [tile]
Output: one JSON line {n, tile, peak_rss_mb, baseline_rss_mb,
        dense_adjacency_mb, labels_checksum}.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import resource, sys
sys.path.insert(0, {repo!r})
import numpy as np
baseline = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
from fluent_bit_ray.ops.cluster import _tiled_min_components
n, tile = {n}, {tile}
rng = np.random.RandomState(11)
# a few dozen true clusters: points are small perturbations of shared
# centroids, so tau=0.93 yields dense within-cluster edges (the regime
# where the dense adjacency would actually be built)
centers = rng.randn(48, 32).astype(np.float32)
X = centers[rng.randint(0, 48, n)] + 0.02 * rng.randn(n, 32).astype(np.float32)
Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
ids = np.arange(n, dtype=np.int64)
labels = _tiled_min_components(ids, Xn, tau=0.93, tile=tile)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(int(labels.sum()), round(baseline, 1), round(peak, 1))
"""


def run(n: int, tile: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, n=n, tile=tile)],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    checksum, baseline, peak = int(out[0]), float(out[1]), float(out[2])
    return {
        "n": n,
        "tile": tile,
        "peak_rss_mb": peak,
        "baseline_rss_mb": baseline,
        # what the dense formulation allocates for the same shard: the
        # n x n float32 similarity matrix plus its bool threshold
        "dense_adjacency_mb": round(n * n * 5 / 1e6, 1),
        "labels_checksum": checksum,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print(json.dumps(run(n, tile)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
