#!/usr/bin/env python
"""Run the @slow quality proofs and write SLOWPROOF_r{N}.json.

Round-3 verdict (weak item 6): the strongest quality bars — the 100k
uniform-random HNSW recall>=0.95 test and the 1M bounded-RSS streaming
build — are @slow and deselected by default, so no driver-visible run
ever re-verified them. This script executes every @slow test under
NDB_RUN_SLOW=1 and records per-test outcomes in an in-repo artifact so
each round carries fresh evidence.

Usage: python scripts/slowproof.py [round_number]
"""

import glob
import json
import os
import re
import subprocess
import sys
import time


def infer_round() -> int:
    rounds = [int(m.group(1)) for p in glob.glob("BENCH_r*.json")
              if (m := re.search(r"BENCH_r0*(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    env = dict(os.environ, NDB_RUN_SLOW="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "slow", "-q",
         "-rA", "--tb=line"],
        env=env, capture_output=True, text=True, timeout=7200)
    tail = proc.stdout[-4000:]
    tests = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"(PASSED|FAILED|ERROR)\s+(tests/\S+)", line)
        if m:
            tests[m.group(2)] = m.group(1)
    out = {
        "round": rnd,
        "rc": proc.returncode,
        "ok": proc.returncode == 0 and bool(tests)
              and all(v == "PASSED" for v in tests.values()),
        "seconds": round(time.time() - t0, 1),
        "tests": tests,
        "tail": tail[-1500:],
    }
    path = f"SLOWPROOF_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "tail"}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
