"""Small runtime utilities: cluster-aware stage sizing.

Ray Data's actor-pool autoscaler starts at the pool minimum and upscales on
backlog; with min=1 a short job finishes before the pool ever grows, so
decode-heavy stages were bottlenecked at a fraction of the cluster. Stages
therefore size their pools from the *live* cluster at plan-build time:
min = half the CPUs (instant ramp), max = all CPUs (never oversubscribes —
Ray only places actors that fit).
"""

from __future__ import annotations

import os


def cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return max(1, int(ray.cluster_resources().get("CPU", 0)))
    return os.cpu_count() or 8


def auto_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Actor-pool (min, max) sized to the cluster at plan time."""
    n = cluster_cpus()
    if cap is not None:
        n = min(n, cap)
    return (max(2, n // 2), max(2, n))
