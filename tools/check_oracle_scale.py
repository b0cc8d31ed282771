#!/usr/bin/env python3
"""check_oracle with a per-query wall-clock budget — for oracle passes on
corpora LARGER than the driver SFs, where a handful of oracle formulations
(all-pairs similarity CTEs) are quadratic in DuckDB and would hang rather
than fail. Each oracle runs in its own subprocess; one that exceeds the
budget is SIGKILLed and reported as TIMEOUT (documented reduced set), not a
hang. The parent blocks on the result queue, never on join(), because a
DuckDB call can sit in C++ long past any polite termination signal.

Usage: python3 tools/check_oracle_scale.py <verifyOutDir> <sfDir> \
           [timeoutSec] [skipFile]
skipFile: optional newline list of query names to skip (resume support).
"""
import json
import math
import multiprocessing as mp
import os
import queue as queue_mod
import sys
import time


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def run_one(outdir, sfdir, name, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    try:
        spark_rel = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
    except Exception as e:
        q.put(("MISS", f"no spark output ({e})")); return
    try:
        duck_rel = con.execute(sql)
        dcols = [d[0] for d in duck_rel.description]
        drows = duck_rel.fetchall()
    except Exception as e:
        q.put(("FAIL", f"oracle sql error: {e}")); return
    if sorted(scols) != sorted(dcols):
        q.put(("FAIL", f"columns {sorted(scols)} != {sorted(dcols)}")); return
    s, d = canon(srows, scols), canon(drows, dcols)
    if len(s) != len(d):
        q.put(("FAIL", f"rows {len(s)} != {len(d)}"))
    elif s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        q.put(("FAIL", f"values differ, e.g. {diffs}"))
    else:
        q.put(("PASS", f"{len(s)} rows"))


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    skip = set()
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        skip = {ln.strip() for ln in open(sys.argv[4]) if ln.strip()}
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    counts = {"PASS": 0, "FAIL": 0, "MISS": 0, "TIMEOUT": 0}
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(outdir, sfdir, name, sql, q))
        p.start()
        # Poll the queue in 1 s slices so a child that DIES without posting
        # (duckdb import error, segfault, OOM-kill) is reported as FAIL
        # (crash) immediately — not mis-counted as a non-failing TIMEOUT
        # after the full budget.
        deadline = time.monotonic() + budget
        status = msg = None
        while status is None:
            try:
                status, msg = q.get(timeout=1.0)
            except queue_mod.Empty:
                if not p.is_alive():
                    try:  # drain race: child may exit right after posting
                        status, msg = q.get(timeout=1.0)
                    except queue_mod.Empty:
                        status = "FAIL"
                        msg = f"oracle subprocess crashed (exitcode {p.exitcode})"
                elif time.monotonic() >= deadline:
                    status, msg = "TIMEOUT", f"oracle exceeded {budget}s"
        p.join(30)
        if p.is_alive():
            p.kill(); p.join()
        print(f"{status}  {name} ({msg})", flush=True)
        counts[status] += 1
    print(f"\n{counts['PASS']} pass, {counts['FAIL']} fail, "
          f"{counts['MISS']} missing, {counts['TIMEOUT']} timeout "
          f"({len(skip)} skipped)")
    sys.exit(1 if (counts["FAIL"] or counts["MISS"]) else 0)


if __name__ == "__main__":
    main()
