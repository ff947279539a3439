"""Probe: blocked-ELL tile geometry of the RCM-ordered synthetic road
graphs (BASELINE configs[3]/[4] scales).

Decides the O(nnz) pack for the 1M single-chip step (VERDICT r4 next #2):
the banded pack stores v_pad x w with w ~ the RCM bandwidth (~9.7k at 1M
-> 9.8 GB int8, V^1.5 scaling), while blocked-ELL stores only the LIVE
bs x bs tiles. This prints, per block size: tiles/block mean/max (ELL
padding factor), total pack bytes, and the fill factor, so the kernel
block size is chosen from data rather than guessed.

Usage: python scripts/probe_ell_geometry.py [n_vertex ...]
"""

import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")

from stgcn_tpu.data.synthetic import random_road_graph
from stgcn_tpu.graph import build_gso
from stgcn_tpu.graph.partition import permute_matrix, rcm_ordering


def probe(n_vertex: int):
    t0 = time.time()
    adj = random_road_graph(n_vertex, k_neighbors=8, seed=0)
    art = build_gso(adj, "sym_norm_lap", cheb=True)
    m = permute_matrix(art.matrix, rcm_ordering(art.matrix)).tocsr()
    print(f"V={n_vertex} nnz={m.nnz} prep {time.time() - t0:.1f}s")
    for bs in (64, 128, 256, 512):
        nbr = -(-n_vertex // bs)
        counts = np.zeros(nbr, np.int64)
        indptr, indices = m.indptr, m.indices
        for i in range(nbr):
            lo, hi = indptr[i * bs], indptr[min((i + 1) * bs, n_vertex)]
            cb = indices[lo:hi] // bs
            counts[i] = len(np.unique(cb))
        max_b = int(counts.max())
        total_live = int(counts.sum())
        ell_bytes = nbr * max_b * bs * bs  # int8
        live_bytes = total_live * bs * bs
        print(f"  bs={bs:4d}: tiles/blk mean {counts.mean():.2f} "
              f"p99 {np.percentile(counts, 99):.0f} max {max_b} | "
              f"ELL {ell_bytes / 2**30:.2f} GiB (live {live_bytes / 2**30:.2f}) "
              f"| fill {m.nnz / live_bytes:.4f} "
              f"| pad-waste {ell_bytes / max(live_bytes, 1):.2f}x")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [100_000]
    for v in sizes:
        probe(v)
