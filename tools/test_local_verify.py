#!/usr/bin/env python3
"""Self-test for tools/local_verify.py's driver-parity shape gate.

Round-8 lesson: the driver's pandas comparator crashes on any
list/struct/map-valued output column ("unhashable type: 'numpy.ndarray'"
in sort_values), shipping the query as an unverified ERROR row. Two
rounds in a row the local gate passed what the driver then failed, so
the local gate now hard-rejects nested top-level columns — and THIS
script pins that rejection, so a comparator refactor that re-loosens it
fails here, before the driver sees it.

Usage: python3 tools/test_local_verify.py   (exit 0 = gate behaves)
"""
import json, os, shutil, subprocess, sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "/root/testdata/sf0.001"


def run_gate(out):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "local_verify.py"), SF, out],
        capture_output=True, text=True)


def case(name, table, oracle, expect_fail, expect_msg):
    out = f"/tmp/lv_selftest_{name}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(f"{out}/{name}")
    pq.write_table(table, f"{out}/{name}/part-0.parquet")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump(oracle, f)
    r = run_gate(out)
    ok = (r.returncode != 0) == expect_fail and expect_msg in r.stdout
    print(f"{'PASS' if ok else 'FAIL'} selftest {name}")
    if not ok:
        print(r.stdout)
    return ok


def main():
    ok = True
    # An array-valued column must be rejected BEFORE the compare — this is
    # exactly the q_vec_quantize shape the driver errored on in round 8.
    ok &= case("q_fake_array",
               pa.table({"id": [1, 2], "codes": [[1, 2], [3, 4]]}),
               {"q_fake_array": "SELECT 1 AS id, [1, 2] AS codes"},
               expect_fail=True, expect_msg="driver-unhashable nested")
    # A struct column is just as unhashable.
    ok &= case("q_fake_struct",
               pa.table({"id": [1], "s": [{"a": 1}]}),
               {"q_fake_struct": "SELECT 1 AS id, {'a': 1} AS s"},
               expect_fail=True, expect_msg="driver-unhashable nested")
    # Scalar columns still pass end-to-end (the gate is a shape check,
    # not a blanket rejection).
    ok &= case("q_fake_scalar",
               pa.table({"id": pa.array([1, 2], type=pa.int64()),
                         "v": ["a", "b"]}),
               {"q_fake_scalar":
                "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'),"
                " (CAST(2 AS BIGINT), 'b')) t(id, v) ORDER BY id"},
               expect_fail=False, expect_msg="PASS q_fake_scalar")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
