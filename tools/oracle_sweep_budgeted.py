"""Full-registry oracle sweep with a per-query time budget.

The plain `check_oracle.py` sweep assumes every DuckDB oracle finishes
in seconds — true at the sf0.01 gate and at sf0.1, but a handful of
oracles are DELIBERATELY lossless all-pairs audits (the simhash
Hamming join, the band-tuning truth set, the cluster recursions) whose
DuckDB cost grows ~quadratically with document count. At an sf1-shape
fixture (50k docs) one such oracle can grind for an hour and stall the
other 380+ results.

This sweep runs the same compare() but arms a watchdog per query: at
`--budget` seconds it interrupts BOTH engines (duckdb
`Connection.interrupt()` cancels the running oracle;
`SparkContext.cancelAllJobs()` aborts a runaway collect) and records
the query as TIMEOUT instead of blocking the sweep. A TIMEOUT is not a
failure — it means the ORACLE (or, rarely, the Spark side) exceeded
the budget at this scale; each one must be explained in the committed
record (ORACLE_sf1shape.md does: every timeout is a documented
gate-scale pair-audit whose 100-TB routing twin stays green).

Usage:
    python3 tools/oracle_sweep_budgeted.py --sf /tmp/ledger4/sf1 \
        [--budget 420] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from tools.check_oracle import compare, duck_connect  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--budget", type=float, default=420.0)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from weather_bigdata_project_spark.session import get_spark

    spark = get_spark("oracle-sweep-budgeted", cpus=args.cpus)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    con = duck_connect(args.sf)

    n_pass = n_fail = n_weak = n_timeout = 0
    timeouts: list[str] = []
    for name in names:
        t0 = time.time()
        fired = threading.Event()
        done = threading.Event()

        def watchdog(done=done, fired=fired) -> None:
            # a single cancelAllJobs can land BETWEEN the many short
            # jobs an iterative driver-loop query submits (label
            # propagation, k-means rounds) and cancel nothing — so
            # keep interrupting every few seconds until the main
            # thread reports the query finished.
            # done/fired MUST be bound as defaults: the loop variables
            # rebind per query, and a late-binding closure re-reads
            # them — a round-8 sweep caught a timed-out query's
            # watchdog re-evaluating `done` against the NEXT query's
            # (unset) event and cancelAllJobs-killing an innocent
            # query 5s into its run
            if not done.wait(args.budget):
                fired.set()
                while not done.wait(5):
                    try:
                        con.interrupt()
                    except Exception:  # noqa: BLE001
                        pass
                    try:
                        spark.sparkContext.cancelAllJobs()
                    except Exception:  # noqa: BLE001
                        pass

        wd = threading.Thread(target=watchdog, daemon=True)
        wd.start()

        class _TimerShim:
            @staticmethod
            def cancel() -> None:
                done.set()

        timer = _TimerShim()
        try:
            sdf = qs[name](spark, args.sf)
            if name not in oracles:
                cnt = sdf.count()
                print(
                    f"WEAK  {name}: no oracle, rows={cnt} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
                n_weak += 1
                continue
            problems = compare(name, sdf, oracles[name], con)
        except Exception as e:  # noqa: BLE001
            if fired.is_set():
                n_timeout += 1
                timeouts.append(name)
                print(
                    f"TIMEOUT {name}: budget {args.budget:.0f}s "
                    f"exceeded ({time.time()-t0:.1f}s)",
                    flush=True,
                )
                continue
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        finally:
            timer.cancel()
        if fired.is_set():
            # interrupt landed between stages without raising — still
            # a timeout, and `problems` may be a partial artifact
            n_timeout += 1
            timeouts.append(name)
            print(f"TIMEOUT {name} (post-stage, "
                  f"{time.time()-t0:.1f}s)", flush=True)
            continue
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)", flush=True)
            for p in problems:
                print(f"      {p}", flush=True)
        else:
            n_pass += 1
            print(f"OK    {name} ({time.time()-t0:.1f}s)", flush=True)
    print(
        f"\n{n_pass} ok, {n_fail} fail, {n_weak} weak (no oracle), "
        f"{n_timeout} timeout{': ' + ','.join(timeouts) if timeouts else ''}"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
