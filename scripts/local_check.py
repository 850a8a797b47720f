#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dump, runs the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB against the same sfDir tables,
and compares row count, column names (sorted), and a value hash with
columns sorted by name and rows sorted by all columns.

Usage: python3 scripts/local_check.py [sfDir] [outDir]
"""
import sys, os, json, glob, hashlib

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# bound DuckDB's spill so a pathological oracle (e.g. the iterative-CTE
# graph replays on a 10x-dense sf1 graph) can't exhaust the disk
con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
con.execute("SET max_temp_directory_size='%s'"
            % os.environ.get("GRAFT_DUCK_TMP_MAX", "40GB"))
# bound RESIDENT memory too: DuckDB's default (80% of RAM) OOM-kills
# the whole process when a pathological oracle materializes a huge
# intermediate while anything else shares the host — a limit makes it
# spill to the temp dir (or fail that one cell) instead
mem = os.environ.get("GRAFT_DUCK_MEM")
if mem:
    con.execute(f"SET memory_limit='{mem}'")
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

# optional per-oracle wall-clock budget (seconds): a watchdog thread
# interrupts DuckDB so an oracle that cannot finish at this SF records
# a TIMEOUT instead of stalling the whole sweep. The driver's own gate
# runs without this env var and is unaffected.
ORACLE_TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

def run_oracle(sql):
    if ORACLE_TIMEOUT <= 0:
        return con.execute(sql).df()
    import threading
    done = threading.Event()
    def watchdog():
        if not done.wait(ORACLE_TIMEOUT):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.execute(sql).df()
    finally:
        done.set()

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings the way a hash-compare would
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted(tuple(cell(v) for v in r) for r in df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()

names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p))
n_ok = n_bad = n_weak = n_timeout = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no parquet output"); n_bad += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracle:
        status = "WEAK " if len(got) > 0 else "FAIL "
        print(f"{status} {name}: rows={len(got)} (no oracle)")
        n_weak += len(got) > 0; n_bad += len(got) == 0
        continue
    try:
        exp = run_oracle(oracle[name])
    except Exception as e:
        if "INTERRUPT" in str(e).upper():
            print(f"TIMEO {name}: oracle exceeded {ORACLE_TIMEOUT:.0f}s "
                  "(DuckDB-side scalability limit, not an engine mismatch)")
            n_timeout += 1
        else:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_bad += 1
        continue
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"cols spark={sorted(got.columns)} duck={sorted(exp.columns)}")
    if len(got) != len(exp):
        problems.append(f"rows spark={len(got)} duck={len(exp)}")
    if not problems and canon(got) != canon(exp):
        problems.append("hash mismatch")
        # show a diff sample
        g = got.reindex(sorted(got.columns), axis=1).sort_values(sorted(got.columns)).reset_index(drop=True)
        e = exp.reindex(sorted(exp.columns), axis=1).sort_values(sorted(exp.columns)).reset_index(drop=True)
        for i in range(min(len(g), len(e))):
            if tuple(g.iloc[i]) != tuple(e.iloc[i]):
                problems.append(f"first diff row {i}:\n  spark={dict(g.iloc[i])}\n  duck ={dict(e.iloc[i])}")
                break
    if problems:
        print(f"FAIL  {name}: " + "; ".join(problems)); n_bad += 1
    else:
        print(f"OK    {name}: rows={len(got)}"); n_ok += 1

print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_timeout} oracle-timeout, {n_bad} fail / {len(names)} total")
sys.exit(1 if n_bad else 0)
