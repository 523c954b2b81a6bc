"""Unit tests for tools/cluster_sizer.py — the sizing arithmetic's
governing constraints must hold across the whole input space (the tool
exists so a 100 TB run never discovers them empirically)."""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

from cluster_sizer import GiB, MiB, recommend  # noqa: E402

TB = 1 << 40


def test_target_fleet_100tb():
    rec = recommend(100 * TB, 1000, 4, 16 * GiB)
    d = rec["_derived"]
    # a shuffle partition fits the per-task execution memory slice
    assert (
        rec["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
        <= d["per_task_exec_mem_bytes"]
    )
    # the cluster is covered: at least 2 waves of reduce tasks
    assert rec["spark.sql.shuffle.partitions"] >= 2 * d["total_cores"]
    # est shuffle volume / partitions stays under the task target
    assert (
        d["est_shuffle_bytes"] / rec["spark.sql.shuffle.partitions"]
        <= d["task_target_bytes"] + 1
    )
    # scan splits are bounded (amortized but not monolithic)
    assert 64 * MiB <= rec["spark.sql.files.maxPartitionBytes"] <= 256 * MiB
    # TB-scale shuffles right-size AQE output instead of maximizing
    # parallelism (inverse of the measured local-mode setting)
    assert (
        rec["spark.sql.adaptive.coalescePartitions.parallelismFirst"]
        == "false"
    )


def test_local_box_matches_session_defaults():
    """The sizer at this container's shape must agree with session.py's
    hand-tuned local defaults (2x cores shuffle partitions)."""
    rec = recommend(1 << 30, 1, 32, 128 * GiB)
    assert rec["spark.sql.shuffle.partitions"] == 64


def test_small_memory_shrinks_partitions_not_coverage():
    """Tight executors shrink the per-partition target (fit memory)
    while the 2x-cores floor keeps the cluster covered."""
    tight = recommend(10 * TB, 100, 8, 4 * GiB)
    roomy = recommend(10 * TB, 100, 8, 64 * GiB)
    assert (
        tight["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
        < roomy["spark.sql.adaptive.advisoryPartitionSizeInBytes"]
    )
    assert tight["spark.sql.shuffle.partitions"] >= 2 * 100 * 8
    # smaller partitions => MORE of them for the same shuffle volume
    assert (
        tight["spark.sql.shuffle.partitions"]
        >= roomy["spark.sql.shuffle.partitions"]
    )


def test_broadcast_threshold_floor_and_cap():
    small = recommend(1 * TB, 10, 4, 1 * GiB)
    big = recommend(1 * TB, 10, 4, 64 * GiB)
    assert small["spark.sql.autoBroadcastJoinThreshold"] >= 10 * MiB
    assert big["spark.sql.autoBroadcastJoinThreshold"] <= 256 * MiB


def test_monotone_in_data_size():
    a = recommend(1 * TB, 100, 4, 16 * GiB)
    b = recommend(100 * TB, 100, 4, 16 * GiB)
    assert (
        b["spark.sql.shuffle.partitions"]
        >= a["spark.sql.shuffle.partitions"]
    )
