#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's t2 compare (SURVEY.md §5.1).

Usage: oracle_check.py <sfDir> <verifyOutDir> [--only-present]
       oracle_check.py --partition-sweep <sfDir> [workDir]
       oracle_check.py --strategy-sweep <sfDir> [workDir]

--only-present compares only the queries actually dumped under
<verifyOutDir> (for subset runs, e.g. the sf0.1 superlinear-family
sweep) instead of failing on oracle entries with no result dir.

For each query dir under <verifyOutDir>: load the Spark-written parquet,
run the query's oracle SQL (from oracle_sql.json) in DuckDB over views named
per table, sort columns by name, stringify every cell, compare row-for-row.

--partition-sweep re-proves partition-order independence mechanically:
it runs graft.Verify TWICE (SPARK_GRAFT_CPUS=4 and =7, which sets
spark.sql.shuffle.partitions) and asserts every query's result rows are
identical between the two dumps — any query whose output depends on
partition count or intra-partition order fails here before the driver
ever sees it.

--strategy-sweep does the same with the PLANNER varied instead: one dump
with default join strategies, one with autoBroadcastJoinThreshold=-1
(every broadcast hash join becomes a shuffle join) — any query whose
result depends on the physical join strategy fails here.
DEV TOOL ONLY — the shipped Scala library has no Python dependency.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation supplier customer part orders lineitem events documents embeddings".split()


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main(sf_dir, out_dir, only_present=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    import os
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        if name not in oracles:
            tbl = pq.read_table(f"{out_dir}/{name}")
            print(f"  {name}: NO-ORACLE ({tbl.num_rows} rows)")
            continue
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        a = spark_df[sc].astype(object).values.tolist()
        b = duck_df[dc].astype(object).values.tolist()
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            ra = [cell(x) for x in ra]
            rb = [cell(x) for x in rb]
            if ra != rb:
                bad = (i, ra, rb)
                break
        if bad:
            i, ra, rb = bad
            print(f"FAIL {name}: row {i}\n  spark={ra}\n  duck ={rb}  (cols {sc})")
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(a)} rows)")
            n_pass += 1
    missing = sorted(set(oracles) - set(declared))
    if missing and not only_present:
        print(f"WARN: oracle entries with no result dir (query threw?): {missing}")
        n_fail += len(missing)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def variant_sweep(sf_dir, work_dir, tag, variants):
    """Run graft.Verify once per (label, env-overrides) variant and assert
    every query's result rows are identical across all dumps."""
    import os
    import pathlib
    import shutil
    import subprocess
    repo = pathlib.Path(__file__).resolve().parents[1]
    dumps = []
    for label, extra_env in variants:
        out = f"{work_dir}/{tag}_{label}"
        shutil.rmtree(out, ignore_errors=True)
        env = dict(os.environ, **extra_env)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out}"],
            cwd=repo, env=env, capture_output=True, text=True)
        if r.returncode != 0:
            sys.exit(f"Verify run [{label}] failed:\n{r.stdout[-3000:]}")
        dumps.append((label, out))
    n_pass = n_fail = 0
    queries = sorted(d for d in os.listdir(dumps[0][1])
                     if os.path.isdir(os.path.join(dumps[0][1], d)))
    for name in queries:
        rows = []
        for _, out in dumps:
            tbl = pq.read_table(f"{out}/{name}")
            tbl = tbl.select(sorted(tbl.column_names))
            rows.append([[cell(v) for v in row]
                         for row in tbl.to_pandas().astype(object).values.tolist()])
        if all(r == rows[0] for r in rows[1:]):
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: result differs across {tag} variants "
                  f"({', '.join(l for l, _ in dumps)})")
    print(f"== {tag} sweep: {n_pass} identical, {n_fail} differ ==")
    sys.exit(1 if n_fail else 0)


def partition_sweep(sf_dir, work_dir):
    variant_sweep(sf_dir, work_dir, "psweep",
                  [("4", {"SPARK_GRAFT_CPUS": "4"}),
                   ("7", {"SPARK_GRAFT_CPUS": "7"})])


def strategy_sweep(sf_dir, work_dir):
    variant_sweep(sf_dir, work_dir, "ssweep",
                  [("default", {}),
                   ("nobcast", {"SPARK_GRAFT_CONF":
                                "spark.sql.autoBroadcastJoinThreshold=-1"})])


if __name__ == "__main__":
    if sys.argv[1] == "--partition-sweep":
        work = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
        partition_sweep(sys.argv[2], work)
    elif sys.argv[1] == "--strategy-sweep":
        work = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
        strategy_sweep(sys.argv[2], work)
    else:
        main(sys.argv[1], sys.argv[2], only_present="--only-present" in sys.argv[3:])
