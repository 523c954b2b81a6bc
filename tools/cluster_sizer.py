"""Cluster conf sizing for a target data scale — the arithmetic behind
SCALE.md's "local -> cluster conf mapping", as a callable tool.

Spark's defaults (200 shuffle partitions, 128 MB scan splits, 10 MB
broadcast threshold) are sized for a laptop-era cluster; at 100 TB the
fatal failures are partitions that don't fit executor memory (spill ->
OOM), task counts far below total cores (idle cluster), and task counts
far above (scheduler overhead + tiny files). This module turns
(data size, executor fleet) into the handful of confs that govern those
failure modes, each with the constraint it satisfies. Pure arithmetic —
unit-tested, no Spark required.

Usage:
    python3 tools/cluster_sizer.py --data-tb 100 --executors 1000 \
        --cores 4 --mem-gb 16
"""

from __future__ import annotations

import argparse
import math

GiB = 1 << 30
MiB = 1 << 20


def recommend(
    data_bytes: int,
    executors: int,
    cores_per_executor: int = 4,
    executor_mem_bytes: int = 16 * GiB,
    shuffle_fraction: float = 0.3,
    target_task_mb: int = 200,
) -> dict:
    """Conf recommendations for scanning `data_bytes` on the fleet.

    The governing constraints, in order:

    1. A shuffle partition must FIT working memory: Spark gives each
       task roughly (executor memory * 0.6 usable * 0.5 execution) /
       cores; the per-partition target is the smaller of that and
       `target_task_mb` (200 MB default — big enough to amortize task
       overhead, small enough to sort/hash in memory).
    2. Task count must cover the cluster: at least 2x total cores
       (stragglers overlap), and AQE coalesces the excess, so we err
       HIGH on the static count — it is a ceiling AQE shrinks, not a
       floor it grows.
    3. Scan splits follow the same target: maxPartitionBytes sizes the
       mapper tasks like shuffle sizes the reducers.
    4. Broadcasts must fit comfortably beside execution memory on
       every executor: 1/32 of executor memory, floored at the 10 MB
       default, capped at 256 MB (serialized relation; the in-memory
       hash relation is ~2-3x larger).
    """
    total_cores = executors * cores_per_executor
    per_task_mem = executor_mem_bytes * 0.6 * 0.5 / cores_per_executor
    task_bytes = int(min(per_task_mem, target_task_mb * MiB))

    shuffle_bytes = int(data_bytes * shuffle_fraction)
    parts_by_size = math.ceil(shuffle_bytes / task_bytes)
    shuffle_partitions = max(parts_by_size, 2 * total_cores)

    scan_split = int(min(task_bytes, 256 * MiB))

    bcast = int(min(max(executor_mem_bytes // 32, 10 * MiB), 256 * MiB))

    return {
        "spark.sql.shuffle.partitions": shuffle_partitions,
        "spark.sql.files.maxPartitionBytes": scan_split,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": task_bytes,
        # right-size AQE output instead of maximizing parallelism: at
        # TB shuffles the local-mode parallelismFirst=true reasoning
        # inverts (see session.py comment)
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.autoBroadcastJoinThreshold": bcast,
        # one reducer's output should land as ~task-sized files
        "spark.sql.files.maxRecordsPerFile": 0,  # govern by partitions
        "_derived": {
            "total_cores": total_cores,
            "per_task_exec_mem_bytes": int(per_task_mem),
            "task_target_bytes": task_bytes,
            "est_shuffle_bytes": shuffle_bytes,
            "scan_tasks": math.ceil(data_bytes / scan_split),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-tb", type=float, required=True)
    ap.add_argument("--executors", type=int, required=True)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mem-gb", type=float, default=16)
    ap.add_argument("--shuffle-fraction", type=float, default=0.3)
    args = ap.parse_args()
    rec = recommend(
        int(args.data_tb * (1 << 40)),
        args.executors,
        args.cores,
        int(args.mem_gb * GiB),
        args.shuffle_fraction,
    )
    import json

    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
