"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs each `queries()[name]` on Spark and `oracle_sql()[name]` on DuckDB
against the same sf dir, then compares row count, column-name schema, and
an order-insensitive canonical value dump. Exact match required; on
mismatch prints the first differing canonical rows plus a float near-miss
diagnosis (so half-even-vs-half-up / ulp issues are visible immediately).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def _canon_factory():
    """Build canon_value as a CLOSURE (non-importable qualname) so
    cloudpickle ships it BY VALUE to executors — the streaming compare
    folds digests worker-side, and a module-level function pickled by
    reference dies there with ModuleNotFoundError when this file was
    imported under a path the workers don't have."""
    import datetime as dt
    import decimal
    import math

    def canon_value(v):
        if v is None:
            return "\x00null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
        if isinstance(v, int):
            return str(v)
        if isinstance(v, dt.datetime):
            return v.isoformat(sep=" ", timespec="microseconds")
        if isinstance(v, dt.date):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon_value(x) for x in v) + "]"
        return str(v)

    return canon_value


canon_value = _canon_factory()


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon_value(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def _multiset_fold(cols, rows_iter):
    """Order-insensitive digest of a row stream: (count, sum of 128-bit
    blake2b digests of each canonical row). Multiset equality via a
    commutative fold, so neither side ever has to hold (or sort) the
    full result — the fix for >1 GiB results tripping
    spark.driver.maxResultSize inside the COMPARISON harness (the
    round-6 sf1-shape sweep failed dedup_simhash this way with zero
    values actually differing)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    n = 0
    acc = 0
    for r in rows_iter:
        key = "\x01".join(canon_value(r[i]) for i in order)
        h = hashlib.blake2b(key.encode(), digest_size=16).digest()
        acc = (acc + int.from_bytes(h, "big")) & ((1 << 160) - 1)
        n += 1
    return n, acc


def _duck_chunks(res):
    while True:
        chunk = res.fetchmany(65536)
        if not chunk:
            return
        yield from chunk


def _spark_multiset_fold(sdf):
    """The Spark side of the streaming compare folds ON THE EXECUTORS:
    each partition reduces to a 2-tuple (count, digest-sum), so the
    driver receives bytes proportional to the partition COUNT, never
    the result — toLocalIterator was not enough (Spark accounts its
    cumulative task results against maxResultSize too, which re-failed
    the 1 GiB case this path exists for). Canonicalization runs the
    same canon_value in the worker Python, so float repr semantics are
    identical to the collect path."""
    cols = sorted(sdf.columns)

    def part_fold(rows):
        n = 0
        acc = 0
        for r in rows:
            key = "\x01".join(canon_value(v) for v in r)
            h = hashlib.blake2b(key.encode(), digest_size=16).digest()
            acc = (acc + int.from_bytes(h, "big")) & ((1 << 160) - 1)
            n += 1
        yield (n, acc.to_bytes(20, "big"))

    parts = sdf.select(*cols).rdd.mapPartitions(part_fold).collect()
    n = sum(p[0] for p in parts)
    acc = sum(int.from_bytes(p[1], "big") for p in parts) & ((1 << 160) - 1)
    return n, acc


def compare_streaming(sdf, sql, con):
    """Bounded-memory compare: identical canonicalization to compare(),
    but folded incrementally — Spark partitions reduce to (count,
    digest) pairs on the executors and DuckDB rows stream through
    fetchmany chunks. No first-diff row dump (the result is too big to
    sort); count + 128-bit multiset digest decide."""
    scols = sdf.columns
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(
            f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
        )
        return problems
    sn, sh = _spark_multiset_fold(sdf)
    on, oh = _multiset_fold(ocols, _duck_chunks(res))
    if sn != on:
        problems.append(f"rowcount mismatch: spark={sn} oracle={on}")
    elif sh != oh:
        problems.append(
            f"multiset digest mismatch over {sn} rows "
            "(result too large for a first-diff dump; both counts equal)"
        )
    return problems


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(name, sdf, sql, con):
    scols = sdf.columns
    try:
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        # collect tripping the driver result cap is a harness limit,
        # not a wrongness signal — re-run the compare as a streamed
        # multiset-digest fold instead of failing the query
        if "maxResultSize" not in str(e):
            raise
        return compare_streaming(sdf, sql, con)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount mismatch: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        _, cs = canon_rows(scols, srows)
        _, co = canon_rows(ocols, orows)
        if cs != co:
            ndiff = sum(1 for a, b in zip(cs, co) if a != b)
            problems.append(f"value mismatch in {ndiff}/{len(cs)} canonical rows")
            shown = 0
            for a, b in zip(cs, co):
                if a != b and shown < 3:
                    problems.append(f"  spark : {a}")
                    problems.append(f"  oracle: {b}")
                    shown += 1
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from weather_bigdata_project_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    con = duck_connect(args.sf)

    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            if name not in oracles:
                cnt = sdf.count()
                print(f"WEAK  {name}: no oracle, rows={cnt} ({time.time()-t0:.1f}s)")
                n_weak += 1
                continue
            problems = compare(name, sdf, oracles[name], con)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"OK    {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} ok, {n_fail} fail, {n_weak} weak (no oracle)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
