#!/usr/bin/env python3
"""Sharded DuckDB oracle runner (round-15 verdict item 2).

Closes the scale-fixture verification gap local_check.py cannot: some
oracles are a single WITH-chain whose intermediate sorts/joins exceed
DuckDB temp (the PQ family pre-argmin, prefixjoin's candidate join) or
any reasonable single-statement wall-clock (semdedup's n x k assigns,
the suffix ladder) at sf16d+. Each such oracle gets a RECIPE in
`SparkEntry.shardedOracleSql` (dumped by graft.Verify as
<outDir>/oracle_sharded.json): an ordered list of DuckDB statements
that materialize the same algorithm stage-by-stage as temp tables,
with the quadratic-ish stages run once per slice.

Step grammar (each step one statement):
  - plain SQL            -> executed once ({S} substituted)
  - "EACH: <sql>"        -> executed once per slice s in [0, S)
                            with {s} and {S} substituted
  The LAST step must be a SELECT producing the final result, compared
  against the engine's parquet dump with the same canonicalization as
  local_check.py (columns sorted by name, rows sorted, md5).

Slice validity is part of each recipe's derivation (recorded as SQL
comments in the Scala source next to the plain oracle): either the
slice key hash-partitions a per-group aggregation whose groups never
cross slices, or the fixture's per-copy vocabulary disjointness
(ScaleUp suffixes every token per copy) makes copy ranges genuinely
independent sub-corpora.

Recipes carry a slice KIND:
  - "hash": the slice key hash-partitions groups that never cross
    slices — valid at ANY slice count; GRAFT_SLICES overrides the
    recipe default.
  - "copy": slices are the scale fixture's key-range copies (valid
    ONLY because ScaleUp's per-token suffixing makes copy vocabularies
    disjoint); the TRUE copy count must be passed as GRAFT_COPIES.
    Defaults to 1 — running the recipe unsliced — so an unscaled
    fixture can never be sliced incorrectly. ONE-LEVEL builds only:
    recursively scaled fixtures reuse suffixes across levels (sf1x16's
    copy-0/sub-i text is bit-identical to copy-i/sub-0 — measured,
    round 15: the sf16d suffix slice run hash-mismatched on exactly
    those cross-copy duplicates, first diff doc_id 5000). Build the
    verification fixture with a single ScaleUp call from the base
    (e.g. sf0.1 x 160 documents-only) and pass GRAFT_COPIES=160.

Usage: python3 scripts/sharded_check.py [sfDir] [outDir] [names-csv]
Env:   GRAFT_DUCK_TMP_MAX, GRAFT_DUCK_MEM, GRAFT_DUCK_THREADS,
       GRAFT_STEP_TIMEOUT (seconds per step, 0 = none),
       GRAFT_SLICES (hash-kind override), GRAFT_COPIES (copy kind)
"""
import sys, os, json, glob, hashlib, time

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

STEP_TIMEOUT = float(os.environ.get("GRAFT_STEP_TIMEOUT", "0") or 0)


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted(tuple(cell(v) for v in r)
                  for r in df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def fresh_con():
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_DUCK_TMP_MAX", "40GB"))
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("GRAFT_DUCK_THREADS")
    if thr:
        con.execute(f"SET threads={thr}")
    # stage tables are unordered sets; dropping insertion-order
    # preservation lets DuckDB stream CTAS/INSERT without buffering
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def run_step(con, sql):
    if STEP_TIMEOUT <= 0:
        return con.execute(sql)
    import threading
    done = threading.Event()
    def watchdog():
        if not done.wait(STEP_TIMEOUT):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.execute(sql)
    finally:
        done.set()


# Frames above this row count skip the pandas canon() path (a
# Python-level per-row loop — ~an hour and tens of GB at 1e8 rows) and
# compare INSIDE DuckDB instead: column names, exact row counts, and an
# order-independent multiset hash (sum over HUGEINT of hash(row) with
# both frames normalized by the SAME expression — doubles rounded to
# canon()'s 9 digits, integers widened to BIGINT, rest cast to
# VARCHAR). Same-process, same normalization on both sides, so any
# value drift still flips the hash.
BIG_CMP = int(os.environ.get("GRAFT_BIGCMP_ROWS", "5000000"))


def norm_exprs(con, rel):
    d = con.execute(f"DESCRIBE {rel}").df()
    pairs = sorted(zip(d["column_name"], d["column_type"]))
    es = []
    for cname, ctype in pairs:
        t = ctype.upper()
        if "DOUBLE" in t or "FLOAT" in t or "DECIMAL" in t:
            es.append(f'round(CAST("{cname}" AS DOUBLE), 9)')
        elif "INT" in t:
            es.append(f'CAST("{cname}" AS BIGINT)')
        else:
            es.append(f'CAST("{cname}" AS VARCHAR)')
    return ", ".join(es), [p[0] for p in pairs]


def multiset_hash(con, rel):
    expr, cols = norm_exprs(con, rel)
    n, h = con.execute(
        f"SELECT count(*), sum(CAST(hash({expr}) AS HUGEINT)) FROM {rel}"
    ).fetchone()
    return n, h, cols


recipes = json.load(open(f"{out}/oracle_sharded.json"))
names = sorted(n for n in recipes if only is None or n in only)
n_ok = n_bad = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no engine dump", flush=True)
        n_bad += 1
        continue
    eng_rows = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet(?)", [sorted(files)]).fetchone()[0]
    big = eng_rows > BIG_CMP
    got = None
    if not big:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
    rec = recipes[name]
    if rec.get("kind") == "copy":
        S = int(os.environ.get("GRAFT_COPIES", "1"))
    else:
        S = int(os.environ.get("GRAFT_SLICES", rec["slices"]))
    # grammar: the LAST step must be a plain SELECT (it produces the
    # expected frame); an EACH: or DDL final step is a recipe bug —
    # report it as a clean per-recipe FAIL, not an AttributeError.
    final = rec["steps"][-1].strip()
    if final.startswith("EACH:") or not final.upper().startswith(("SELECT", "WITH")):
        print(f"FAIL  {name}: recipe grammar: final step must be a plain "
              f"SELECT, got: {final[:60]!r}", flush=True)
        n_bad += 1
        continue
    con = fresh_con()
    t0 = time.time()
    exp = None
    try:
        for idx, step in enumerate(rec["steps"]):
            last = idx == len(rec["steps"]) - 1
            ts = time.time()
            if step.startswith("EACH:"):
                body = step[len("EACH:"):]
                for s in range(S):
                    run_step(con, body.replace("{s}", str(s))
                                      .replace("{S}", str(S)))
                    print(f"      {name} step {idx} slice {s + 1}/{S} "
                          f"({time.time() - ts:.0f}s cum)", flush=True)
            else:
                sql = step.replace("{S}", str(S))
                if last and big:
                    run_step(con, f"CREATE TEMP TABLE __final AS ({sql})")
                    exp = "__final"
                else:
                    cur = run_step(con, sql)
                    if last:
                        exp = cur.df()
            print(f"      {name} step {idx} done in "
                  f"{time.time() - ts:.0f}s", flush=True)
        if big:
            # DuckDB-side compare (see BIG_CMP note above): engine dump
            # as a view over its parquet files, same normalization
            # expression on both relations, count + multiset hash.
            flist = "[" + ", ".join(f"'{f}'" for f in sorted(files)) + "]"
            con.execute(
                f"CREATE VIEW __eng AS SELECT * FROM read_parquet({flist})")
            en, eh, ecols = multiset_hash(con, "__eng")
            on, oh, ocols = multiset_hash(con, "__final")
            problems = []
            if ecols != ocols:
                problems.append(f"cols spark={ecols} duck={ocols}")
            if en != on:
                problems.append(f"rows spark={en} duck={on}")
            if not problems and eh != oh:
                problems.append(f"multiset hash mismatch ({eh} vs {oh})")
            con.close()
            if problems:
                print(f"FAIL  {name}: " + "; ".join(problems), flush=True)
                n_bad += 1
            else:
                print(f"OK    {name}: rows={en} "
                      f"({time.time() - t0:.0f}s, {S} slices, duckdb-cmp)",
                      flush=True)
                n_ok += 1
            continue
    except Exception as e:
        print(f"FAIL  {name}: step error: {e}", flush=True)
        n_bad += 1
        con.close()
        continue
    con.close()
    if exp is None or isinstance(exp, str):
        print(f"FAIL  {name}: recipe produced no expected frame", flush=True)
        n_bad += 1
        continue
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"cols spark={sorted(got.columns)} "
                        f"duck={sorted(exp.columns)}")
    if len(got) != len(exp):
        problems.append(f"rows spark={len(got)} duck={len(exp)}")
    if not problems and canon(got) != canon(exp):
        problems.append("hash mismatch")
        g = got.reindex(sorted(got.columns), axis=1) \
               .sort_values(sorted(got.columns)).reset_index(drop=True)
        e = exp.reindex(sorted(exp.columns), axis=1) \
               .sort_values(sorted(exp.columns)).reset_index(drop=True)
        for i in range(min(len(g), len(e))):
            if tuple(g.iloc[i]) != tuple(e.iloc[i]):
                problems.append(
                    f"first diff row {i}:\n  spark={dict(g.iloc[i])}"
                    f"\n  duck ={dict(e.iloc[i])}")
                break
    if problems:
        print(f"FAIL  {name}: " + "; ".join(problems), flush=True)
        n_bad += 1
    else:
        print(f"OK    {name}: rows={len(got)} "
              f"({time.time() - t0:.0f}s, {S} slices)", flush=True)
        n_ok += 1

print(f"\n{n_ok} ok, {n_bad} fail / {len(names)} total")
sys.exit(1 if n_bad else 0)
