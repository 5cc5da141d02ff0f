"""Small runtime utilities (no ray.init here — session is the driver's)."""

from __future__ import annotations


def pool_bounds(max_actors: int | None = None, num_cpus: float = 1.0) -> tuple[int, int]:
    """Actor-pool (min, max) sized to the cluster: max ~= the CPUs the pool
    may use (leaving headroom for read/write/shuffle tasks), min = half of
    that so short stages reach parallelism immediately instead of waiting on
    the autoscaler ramp (measured: (1,16) pools ran a 7 s stage in 12 s).

    ``max_actors`` optionally caps the pool (e.g. a stage whose state is
    expensive to replicate)."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover - ray not importable
        ncpu = 4
    hi = max(1, int((ncpu - 2) / max(num_cpus, 0.25)))
    if max_actors is not None:
        hi = max(1, min(hi, max_actors))
    # min = hi//4: enough immediate parallelism for short stages without
    # paying hi actor-process startups on every stage (actors are fresh
    # worker processes; tasks reuse warm ones)
    lo = max(1, hi // 4)
    return (lo, hi)
