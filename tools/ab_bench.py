"""Interleaved A/B bench for optimization rounds (guide §1, round 12).

Runs the SAME query subset through bench.py's fresh-JVM worker in two
source trees (e.g. the pre-round tree and HEAD), ALTERNATING A/B/A/B…
so host-noise ramps land on both variants, and reports per-query
min-basis seconds per variant plus each batch's calibration-kernel
seconds (bench.calibration_kernel) so a contended sitting is visible in
the artifact instead of adjudicated by narrative.

Usage:
  python tools/ab_bench.py --a /tmp/pre_r12 --b /root/repo \
      --only q1,q2 [--rounds 2] [--sf DIR] [--out OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def run_batch(tree: str, only: str, sf: str) -> dict:
    fd, out = tempfile.mkstemp(prefix="ab_batch_", suffix=".json")
    os.close(fd)
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = only
    env["SPARK_GRAFT_SF_DIR"] = sf
    env.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(tree, "bench.py"), "--worker", out],
            env=env, cwd=tree, timeout=7200,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            raise RuntimeError(f"worker rc={r.returncode} in {tree}")
        with open(out) as fh:
            return json.load(fh)
    finally:
        try:
            os.unlink(out)
        except OSError:
            pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="baseline tree")
    ap.add_argument("--b", required=True, help="candidate tree")
    ap.add_argument("--only", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    res = {"a": {"tree": args.a, "batches": []},
           "b": {"tree": args.b, "batches": []}}
    for i in range(args.rounds):
        for tag in ("a", "b"):
            t0 = time.strftime("%H:%M:%S")
            batch = run_batch(res[tag]["tree"], args.only, args.sf)
            env = batch["env"]
            print(f"[{t0}] round {i + 1} {tag}: "
                  f"calib {env.get('calib_secs')}→{env.get('calib_secs_end')} "
                  f"load {env.get('load_avg_1m')}→{env.get('load_avg_1m_end')}",
                  file=sys.stderr, flush=True)
            res[tag]["batches"].append(batch)

    report = {}
    for tag in ("a", "b"):
        mins: dict[str, float] = {}
        for b in res[tag]["batches"]:
            for n, s in b["queries"].items():
                mins[n] = min(mins.get(n, float("inf")), float(s))
        res[tag]["min"] = {n: round(s, 3) for n, s in mins.items()}
        res[tag]["calibs"] = [
            (b["env"].get("calib_secs"), b["env"].get("calib_secs_end"))
            for b in res[tag]["batches"]]
    for n in res["a"]["min"]:
        a, b = res["a"]["min"][n], res["b"]["min"].get(n)
        report[n] = {"a": a, "b": b,
                     "ratio": round(b / a, 3) if b and a else None}
        print(f"{n:42s} A {a:7.2f}s  B {b:7.2f}s  B/A "
              f"{report[n]['ratio']}", flush=True)
    out = args.out or "/tmp/ab_bench.json"
    with open(out, "w") as fh:
        json.dump({"report": report,
                   "a_calibs": res["a"]["calibs"],
                   "b_calibs": res["b"]["calibs"],
                   "a_batches": [b["queries"] for b in res["a"]["batches"]],
                   "b_batches": [b["queries"] for b in res["b"]["batches"]],
                   }, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
