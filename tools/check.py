#!/usr/bin/env python3
"""Dev-loop mimic of the driver's t2 gate (SURVEY.md §5.3).

Usage: python3 tools/check.py <verify_outdir> <sfdir> [query ...]

Reads <verify_outdir>/oracle_sql.json (written by graft.Verify), registers the
fixture parquet files as DuckDB views under bare table names, runs each oracle
SQL, and compares cell-by-cell against the Spark-written parquet in
<verify_outdir>/<query>/. NOT part of the shipped library — dev tooling only.
"""
import sys, json, math, glob, os

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, np.generic):
        return norm(v.item())
    return v


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; graft.GenData output is a Spark
        # directory of part files — glob the latter
        path = f"{sfdir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        if t == "events":
            # driver parquet carries TIMESTAMP_NS ts; generated parquet
            # carries BIGINT ns. Normalize both to the same µs timestamp the
            # Spark side produces (timestamp_micros(ts div 1000)).
            typ = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{src}') LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{src}')")
                continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass, fails = 0, []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            fails.append(name)
            print(f"FAIL {name}: no spark output (Verify errored?)")
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: exec error: {e}")
            continue
        sdf = sdf[sorted(sdf.columns)]
        ddf = ddf[sorted(ddf.columns)]
        if list(sdf.columns) != list(ddf.columns):
            fails.append(name)
            print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            fails.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            continue
        # The driver's hash is dtype-KIND-sensitive (r15 verdict:
        # q_sample_budget value-passed here but hash-failed there when
        # DuckDB's HUGEINT sum widened to float64 in pandas), while same-kind
        # width differences (int32 vs int64) hash equal. FAIL on a kind
        # mismatch so the dev loop can never value-pass what the driver's
        # hash will fail.
        dbad = [c for c in sdf.columns if sdf[c].dtype.kind != ddf[c].dtype.kind]
        if dbad:
            fails.append(name)
            for c in dbad:
                print(f"FAIL {name}.{c}: dtype kind spark={sdf[c].dtype} duck={ddf[c].dtype}")
            continue
        bad = 0
        srows = list(sdf.itertuples(index=False, name=None))
        drows = list(ddf.itertuples(index=False, name=None))
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            a, b = tuple(norm(x) for x in sr), tuple(norm(x) for x in dr)
            if a != b:
                if bad < 3:
                    diff = [(c, x, y) for c, x, y in zip(sdf.columns, a, b) if x != y]
                    print(f"FAIL {name} row {i}: {diff[:4]}")
                bad += 1
        if bad:
            fails.append(name)
            print(f"FAIL {name}: {bad} mismatched rows")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{n_pass} passed, {len(fails)} failed" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
