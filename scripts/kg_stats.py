#!/usr/bin/env python
"""Per-operator Ray Data stats for the KG pipeline (the `ds.stats()` audit).

Runs the flagship pipeline at a small sf and prints, per materialized stage,
the executor's own operator breakdown — wall time, block counts, per-block
sizes, task distribution. Usage:

    python scripts/kg_stats.py [sf] [num_cpus]     # default 0.01, 8
"""

from __future__ import annotations

import re
import shutil
import sys


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from chunksilo_ray import datagen
    from chunksilo_ray.pipelines.kg import build_kg

    corpus = datagen.corpus_dir(sf)
    out = f"/tmp/chunksilo_ray_stats/sf{sf:g}"
    shutil.rmtree(out, ignore_errors=True)
    res = build_kg(
        f"{corpus}/transcripts.parquet", f"{corpus}/alias_index.parquet", out,
        with_chunks=True,
    )

    interesting = re.compile(
        r"Operator |\* Remote wall time|\* Output num rows|\* Output size bytes|blocks executed"
    )
    for name in ("edges", "edges_agg", "nodes", "chunks"):
        ds = res.get(name)
        if ds is None:
            continue
        print(f"\n===== {name} — operator stats =====")
        for line in ds.stats().splitlines():
            if interesting.search(line):
                print(line.rstrip())
    print("\nmetrics:", res["metrics"])
    ray.shutdown()


if __name__ == "__main__":
    main()
