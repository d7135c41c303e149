#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <out>"`
plus out/oracle_sql.json, runs each oracle SQL in DuckDB against the same
fixture tables, and compares row-by-row (columns sorted by name, values
hashed). Not part of the shipped library — dev tooling only.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # floats compared exactly (our queries are engineered to be bit-stable);
    # everything else via repr.
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def table_fingerprint(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    snames = [names[i] for i in order]
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return snames, out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # Union of declared queries (manifest), oracle keys, and whatever output
    # dirs exist — a declared query that threw (no output dir, no oracle)
    # must FAIL here, not vanish from the report.
    declared = set()
    mpath = os.path.join(out_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            declared = set(json.load(f))
    names = sorted(declared | set(oracles) |
                   {n for n in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, n))})
    n_pass = n_fail = 0
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: query declared but no spark output dir")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # Read ALL part files — correctness must not depend on Verify
        # coalescing to a single partition.
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        s_names = tbl.column_names
        s_rows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({tbl.num_rows} rows, rows-only check: "
                  f"{'PASS' if tbl.num_rows > 0 else 'FAIL — EMPTY'})")
            if tbl.num_rows == 0:
                n_fail += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_names = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sn, sr = table_fingerprint(s_names, s_rows)
        dn, dr = table_fingerprint(d_names, d_rows)
        if sn != dn:
            print(f"FAIL {name}: columns spark={sn} duck={dn}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i in range(len(sr)) if sr[i] != dr[i])
            print(f"FAIL {name}: first diff at row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
