"""Cluster deployment profile: the conf delta between local[32] and a
1000-executor / 100 TB deployment.

`session.get_spark` carries the semantics confs (UTC, ANSI-off, Arrow,
AQE) that must hold everywhere; this module holds the SIZING confs that
change with the cluster, derived from the deployment's shape rather than
hardcoded. Use::

    get_spark(extra_conf=cluster_conf(executors=1000, executor_cores=4,
                                      executor_mem_gb=28))

Rationale per knob is in the function body — these numbers are the
standard capacity arithmetic, not magic: shuffle partitions ~ 2-3x total
cores (elastic under AQE coalescing), 128-256 MB scan splits, broadcast
threshold bounded by executor memory headroom, shuffle IO consolidated
for object-store shuffle services.
"""

from __future__ import annotations

__all__ = ["cluster_conf"]


def cluster_conf(
    executors: int,
    executor_cores: int = 4,
    executor_mem_gb: int = 28,
    target_partition_mb: int = 192,
) -> dict[str, str]:
    """Sizing confs for a cluster of ``executors`` x ``executor_cores``.

    - shuffle.partitions: 3x total cores. Static value is only the
      pre-AQE upper bound — AQE coalesces down per stage, so erring high
      costs little; erring low caps parallelism and spills.
    - advisoryPartitionSizeInBytes: what AQE coalesces TOWARD; with
      100 TB inputs, 192 MB post-shuffle partitions keep per-task memory
      bounded (a partition must fit in a task's working set).
    - files.maxPartitionBytes: scan-side split size; 192 MB aligns scan
      tasks with row-group boundaries and amortizes open cost over the
      long haul (vs the 128 MB default tuned for smaller clusters).
    - autoBroadcastJoinThreshold: ~1/16 of executor memory per the usual
      headroom rule (broadcast lives on every executor alongside
      shuffle/UDF memory); floors at 32 MB, caps at 256 MB.
    - minPartitionNum: keeps AQE from over-coalescing below the cluster's
      core count (idle executors at 1000-node scale are the expensive
      failure mode, not small tasks).
    """
    total_cores = executors * executor_cores
    broadcast_mb = min(max(executor_mem_gb * 1024 // 16, 32), 256)
    return {
        "spark.sql.shuffle.partitions": str(3 * total_cores),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": (
            f"{target_partition_mb}m"
        ),
        "spark.sql.adaptive.coalescePartitions.minPartitionNum": str(total_cores),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.autoBroadcastJoinThreshold": str(broadcast_mb * 1024 * 1024),
    }
