#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables, sort columns by name + rows, and compare values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import sys

import duckdb


def digest(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def run(sf_dir, out_dir, only=None, log=print):
    """Compare every query in out_dir against its DuckDB oracle.

    Returns (results, hashes): results maps query name -> "PASS" or a
    "FAIL: <reason>" string, hashes maps name -> python-canon digests
    of both sides (paired with the Scala-canon digests in
    $out_dir/hashes.json, a hash-red row is attributable to a side).
    """
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    hashes = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            res = con.execute(f"SELECT * FROM read_parquet("
                              f"'{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in res.description]
            got = canon(res.fetchall(), got_cols)
        except Exception as e:
            results[name] = f"FAIL: cannot read spark output: {e}"
            log(f"FAIL {name}: cannot read spark output: {e}")
            continue
        try:
            ores = con.execute(sql)
            want_cols = [d[0] for d in ores.description]
            want = canon(ores.fetchall(), want_cols)
        except Exception as e:
            results[name] = f"FAIL: oracle error: {e}"
            log(f"FAIL {name}: oracle error: {e}")
            continue
        hashes[name] = {"engine": digest(got), "oracle": digest(want),
                        "n_engine": len(got), "n_oracle": len(want)}
        if sorted(got_cols) != sorted(want_cols):
            results[name] = (f"FAIL: cols {sorted(got_cols)} != "
                             f"{sorted(want_cols)}")
            log(f"FAIL {name}: cols {sorted(got_cols)} != "
                f"{sorted(want_cols)}")
        elif got != want:
            diff_g = [x for x in got if x not in set(want)][:3]
            diff_w = [x for x in want if x not in set(got)][:3]
            results[name] = (f"FAIL: rows {len(got)} vs {len(want)}; "
                             f"spark-only={diff_g} oracle-only={diff_w}")
            log(f"FAIL {name}: rows {len(got)} vs {len(want)}; "
                f"spark-only={diff_g} oracle-only={diff_w}")
        else:
            results[name] = "PASS"
            log(f"PASS {name} ({len(got)} rows)")
    with open(f"{out_dir}/hashes_py.json", "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
    return results, hashes


def main(sf_dir, out_dir, only=None):
    results, _ = run(sf_dir, out_dir, only)
    n_pass = sum(1 for v in results.values() if v == "PASS")
    n_fail = len(results) - n_pass
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
