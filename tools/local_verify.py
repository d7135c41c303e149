#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <out>"`
plus out/oracle_sql.json, runs each oracle SQL in DuckDB against the same
fixture tables, and compares row-by-row (columns sorted by name, values
hashed). Not part of the shipped library — dev tooling only.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json, sys, glob, os, datetime
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Coarse arrow-type class for the typed compare.

    The driver compares arrow-typed values, so an int64 Spark column vs a
    DuckDB HUGEINT (int128 -> arrow decimal128(38,0)) column must FAIL here
    even when every numeric value is equal (round-7 lesson: 14 oracles
    shipped red because the old repr()-based compare erased this).
    We tolerate only representational variants that carry no SQL meaning:
    string vs large_string, binary widths, timestamp tz annotation (values
    are normalized to UTC in norm_cell), and list offset widths.
    """
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or \
            pa.types.is_fixed_size_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_class(t.key_type)},{type_class(t.item_type)}>"
    # Integer WIDTHS are normalized (the driver's value-level compare sees
    # Python int either way — e.g. Spark's int32 rank()/ntile() vs DuckDB's
    # int64 hash-match there, verified against CORRECTNESS_r07), but
    # int-vs-decimal stays fatal: an uncast SUM(BIGINT) in an oracle is
    # HUGEINT -> arrow decimal128(38,0) -> Decimal values, exactly the
    # class of miss that shipped 14 red rows in round 7.
    if pa.types.is_integer(t):
        return "int"
    # float32/64, bool, decimal128(p,s) keep their exact name.
    return str(t)


def norm_cell(v):
    # floats compared exactly (our queries are engineered to be bit-stable);
    # timestamps normalized to naive-UTC (spark parquet is tz-tagged, duckdb
    # arrow is naive); everything else via repr — which keeps Decimal('5')
    # distinct from 5, backing up the type_class compare at the value level.
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return repr(v)


def table_fingerprint(tbl):
    """(sorted col names, sorted col type-classes, row tuples) for an arrow
    table — both sides of the compare go through arrow now, so the
    fingerprint carries types, not just values."""
    names = tbl.column_names
    order = sorted(range(len(names)), key=lambda i: names[i])
    snames = [names[i] for i in order]
    stypes = [type_class(tbl.schema.field(i).type) for i in order]
    cols = [tbl.column(i) for i in order]
    out = []
    for i in range(tbl.num_rows):
        out.append(tuple(norm_cell(c[i].as_py()) for c in cols))
    return snames, stypes, out


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
        if name not in oracles:
            nested = [f.name for f in tbl.schema
                      if pa.types.is_nested(f.type)]
            warn = (f" [WARN nested cols {nested} — fine rows-only, fatal "
                    f"if an oracle is ever added]" if nested else "")
            print(f"SKIP {name}: no oracle ({tbl.num_rows} rows, rows-only check: "
                  f"{'PASS' if tbl.num_rows > 0 else 'FAIL — EMPTY'}){warn}")
            if tbl.num_rows == 0:
                n_fail += 1
            continue
        # Driver parity (round-8 lesson): the driver loads both sides into
        # pandas and sorts every column with sort_values, which raises
        # "unhashable type: 'numpy.ndarray'" on ANY list/struct/map-valued
        # column — the query then ships as err'd, unverified. Hard-reject
        # nested top-level columns here so that shape never reaches the
        # driver. (Rows-only queries skip the driver compare, so they are
        # exempt — but the same shape there would break if an oracle were
        # ever added, hence the warning above in the SKIP branch.)
        nested = [f.name for f in tbl.schema
                  if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                  or pa.types.is_fixed_size_list(f.type)
                  or pa.types.is_struct(f.type) or pa.types.is_map(f.type)]
        if nested:
            print(f"FAIL {name}: driver-unhashable nested column(s) {nested} "
                  f"in gated output — the driver's pandas sort_values crashes "
                  f"on these; emit scalar columns (CSV-join or explode)")
            n_fail += 1
            continue
        try:
            dtbl = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sn, st, sr = table_fingerprint(tbl)
        dn, dt, dr = table_fingerprint(dtbl)
        if sn != dn:
            print(f"FAIL {name}: columns spark={sn} duck={dn}")
            n_fail += 1
        elif st != dt:
            bad = [(sn[i], st[i], dt[i]) for i in range(len(st)) if st[i] != dt[i]]
            print(f"FAIL {name}: column TYPES differ (spark vs duck): {bad}")
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
