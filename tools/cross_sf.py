#!/usr/bin/env python3
"""Cross-sf correctness GATE (round-9): run the full Verify dump + the
DuckDB compare at BOTH sf0.001 and sf0.01 and write one committed
per-query artifact.

Why a gate and not a playbook step: the round-8 MinHash permutation
collapse (22/24 "independent" permutations degenerate) was invisible to
eight rounds of the single-sf (sf0.01) oracle — its banding happened to
stay total on that one corpus — and fell out of exactly this sweep at
sf0.001. Scale-dependent degeneracy needs at least two corpus sizes.

Usage: python3 tools/cross_sf.py [out.json]   (default CROSS_SF.json)

Runs the two Verify dumps SEQUENTIALLY via sbt (never run two sbt
invocations concurrently — the documented warehouse/dump race), then
compares both with the driver-identical canonicalization. Exit code 1
if ANY query fails at ANY sf, so CI/round-close can gate on it.
"""
import json
import os
import subprocess
import sys

import compare

SFS = ["sf0.001", "sf0.01"]
TESTDATA = "/root/testdata"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def verify_dump(sf, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {TESTDATA}/{sf} {out_dir}"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    tail = "\n".join(r.stdout.splitlines()[-15:])
    if r.returncode != 0:
        raise RuntimeError(f"Verify at {sf} exited {r.returncode}:\n{tail}")
    failed = os.path.join(out_dir, "_FAILED.txt")
    if os.path.exists(failed):
        raise RuntimeError(
            f"Verify at {sf} had dump failures:\n{open(failed).read()}")


def main(out_json):
    per_sf = {}
    for sf in SFS:
        out_dir = os.path.join(REPO, "target", f"cross_{sf}")
        subprocess.run(["rm", "-rf", out_dir], check=True)
        print(f"== Verify dump @ {sf} ==", flush=True)
        verify_dump(sf, out_dir)
        print(f"== DuckDB compare @ {sf} ==", flush=True)
        results, _ = compare.run(
            f"{TESTDATA}/{sf}", out_dir,
            log=lambda m: None)  # summarized below; keep output short
        per_sf[sf] = results
        n_fail = sum(1 for v in results.values() if v != "PASS")
        print(f"   {len(results) - n_fail} passed, {n_fail} failed",
              flush=True)

    names = sorted(set().union(*[set(r) for r in per_sf.values()]))
    queries = {
        n: {sf: per_sf[sf].get(n, "MISSING") for sf in SFS}
        for n in names
    }
    bad = {n: v for n, v in queries.items()
           if any(x != "PASS" for x in v.values())}
    artifact = {
        "sfs": SFS,
        "n_queries": len(names),
        "n_all_green": len(names) - len(bad),
        "failures": bad,
        "queries": queries,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\ncross-sf: {artifact['n_all_green']}/{len(names)} green "
          f"at every sf -> {out_json}")
    for n, v in sorted(bad.items()):
        print(f"  RED {n}: {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "CROSS_SF.json"))
