"""Scale stress for the distributed graph-analytics rounds
(deduce_ray.rayops.kg.pagerank with driver_max_arcs=0).

Builds a random undirected graph (power-law-ish degree skew via
preferential attachment on a coarse grid) as a Ray dataset, runs BOTH
paths — the sharded message-passing rounds and the bounded driver fast
path — and checks score equality before reporting wall times.  The
distributed path's per-round cost should stay linear in |arcs| and the
two paths must agree exactly (both round to 6 decimals at output).

Usage: python scripts/stress_pagerank.py [n_nodes] [n_edges] [cpus] [--lpa]
Defaults: 200_000 nodes, 1_000_000 edges, 16 CPUs; --lpa stresses the
label-propagation rounds (same machinery) instead of PageRank.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--lpa"]
    lpa = "--lpa" in sys.argv[1:]
    n_nodes = int(args[0]) if len(args) > 0 else 200_000
    n_edges = int(args[1]) if len(args) > 1 else 1_000_000
    cpus = int(args[2]) if len(args) > 2 else 16

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    from deduce_ray.rayops.kg import label_propagation, pagerank

    rng = np.random.default_rng(13)
    # skewed endpoints: square a uniform draw so low ids act as hubs
    a = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    b = rng.integers(0, n_nodes, size=n_edges)
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    # one row per undirected edge (duplicates collapse)
    key = lo * n_nodes + hi
    _, idx = np.unique(key, return_index=True)
    lo, hi = lo[idx], hi[idx]
    print(f"graph: {n_nodes} nodes, {len(lo)} undirected edges")

    tbl = pa.table(
        {
            "pred_a": pa.array(["e"] * len(lo)),
            "obj_a": pa.array([f"n{x}" for x in lo.tolist()]),
            "pred_b": pa.array(["e"] * len(hi)),
            "obj_b": pa.array([f"n{x}" for x in hi.tolist()]),
        }
    )
    blocks = [tbl.slice(i, 65536) for i in range(0, tbl.num_rows, 65536)]
    ds = ray.data.from_arrow(blocks)

    if lpa:
        t0 = time.time()
        dist = {
            (r["pred"], r["obj"]): (r["label_pred"], r["label_obj"])
            for r in label_propagation(ds, driver_max_arcs=0).take_all()
        }
        t_dist = time.time() - t0
        print(f"LPA distributed rounds: {t_dist:.1f} s "
              f"({len(dist)} nodes, {2 * len(lo) / t_dist:.0f} arcs/s)")
        t0 = time.time()
        fast = {
            (r["pred"], r["obj"]): (r["label_pred"], r["label_obj"])
            for r in label_propagation(
                ds, driver_max_arcs=10 * len(lo) + 10
            ).take_all()
        }
        print(f"LPA driver fast path:   {time.time() - t0:.1f} s")
        if set(dist) != set(fast):
            print("FAIL: node sets diverge")
            return 1
        diff = sum(1 for k in dist if dist[k] != fast[k])
        print(f"label equality: {len(dist) - diff}/{len(dist)} exact")
        if diff:
            print("FAIL: paths diverge (labels are exact strings — no "
                  "rounding tolerance applies)")
            return 1
        print("OK")
        ray.shutdown()
        return 0

    t0 = time.time()
    dist = {
        (r["pred"], r["obj"]): r["score"]
        for r in pagerank(ds, driver_max_arcs=0).take_all()
    }
    t_dist = time.time() - t0
    print(f"distributed rounds: {t_dist:.1f} s "
          f"({len(dist)} nodes, {2 * len(lo) / t_dist:.0f} arcs/s)")

    t0 = time.time()
    fast = {
        (r["pred"], r["obj"]): r["score"]
        for r in pagerank(ds, driver_max_arcs=10 * len(lo) + 10).take_all()
    }
    t_fast = time.time() - t0
    print(f"driver fast path:   {t_fast:.1f} s")

    if set(dist) != set(fast):
        only_d = len(set(dist) - set(fast))
        only_f = len(set(fast) - set(dist))
        print(f"FAIL: node sets diverge ({only_d} only-distributed, "
              f"{only_f} only-fast)")
        return 1
    diff = [k for k in dist if dist[k] != fast[k]]
    mass = sum(dist.values())
    print(f"score equality: {len(dist) - len(diff)}/{len(dist)} exact "
          f"(6-decimal outputs); rank mass {mass:.4f}")
    if diff:
        worst = max(abs(dist[k] - fast[k]) for k in diff)
        print(f"  max divergence {worst:.2e} over {len(diff)} nodes "
              f"(rounding-boundary straddles are expected at ~1e-9 rate)")
        if worst > 2e-6:
            print("FAIL: paths diverge beyond rounding")
            return 1
    if abs(mass - 1.0) > 1e-3:
        print("FAIL: rank mass not conserved")
        return 1
    print("OK")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
