#!/usr/bin/env python3
"""Assemble the committed VERIFY_HASHES_r{N}.json digest artifact from
a completed Verify run + compare pass (e.g. the sf0.01 leg of
tools/cross_sf.py).

Usage: python3 tools/verify_hashes.py <verify_out_dir> <out.json> [note]

Inputs read from <verify_out_dir>:
  hashes.json     Scala-canon per-query/dump digests written by
                  graft.Verify (rows inlined when n <= 64)
  hashes_py.json  python-canon engine+oracle digests written by
                  tools/compare.py

The committed artifact lets any other environment's hash-red row be
attributed to a side: identical Scala digests => the engine produced
the same rows there, so the divergence is oracle/comparator-side.
"""
import json
import sys


def main(out_dir, out_json, note):
    scala = json.load(open(f"{out_dir}/hashes.json"))
    python = json.load(open(f"{out_dir}/hashes_py.json"))
    artifact = {
        "readme": (
            f"Canonical digests at sf0.01 ({len(scala['queries'])} "
            "queries). queries/dumps: Scala-canon digests from "
            "graft.Verify hashes.json (rows inlined when n<=64) - "
            "compare against any other environment's run to attribute "
            "a hash-red row to the engine side. python: python-canon "
            "digests of engine parquet AND DuckDB oracle - "
            "engine==oracle for every query in this run. " + note
        ).strip(),
        "queries": scala["queries"],
        "dumps": scala["dumps"],
        "python": python,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}: {len(scala['queries'])} queries, "
          f"{len(scala['dumps'])} dumps")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "")
