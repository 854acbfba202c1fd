"""Prefill-fairness sweep: TTFT vs throughput at fixed concurrency.

VERDICT r4 weak #5: burst arrivals all drain through one batched prefill,
so TTFT p50 scales with the whole backlog (2.36 s at 32-way). The
`--prefill-fair-rows` cap staggers completions; this sweeps the cap at one
concurrency level and records the measured TTFT/throughput tradeoff —
the operating-point data for the serve flag. Writes BENCH_FAIRNESS_r05.json.

Env: JLAMA_BENCH_REQS (default 16), JLAMA_BENCH_FAIR_SWEEP ("0,1,2,4";
0 = unlimited), plus bench_serving.py's usual knobs.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CAPS = [
    int(x)
    for x in os.environ.get("JLAMA_BENCH_FAIR_SWEEP", "0,1,2,4").split(",")
]
LEVEL = os.environ.get("JLAMA_BENCH_REQS", "16")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    points = []
    for cap in CAPS:
        env = dict(os.environ)
        env["JLAMA_BENCH_REQS"] = LEVEL
        if cap:
            env["JLAMA_PREFILL_FAIR_ROWS"] = str(cap)
        else:
            env.pop("JLAMA_PREFILL_FAIR_ROWS", None)
        print(f"--- fair-rows {cap or 'unlimited'} ---", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench_serving.py")],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"fair-rows {cap} failed rc={proc.returncode}")
        p = json.loads(line)
        p["fair_rows"] = cap
        print(json.dumps(p), flush=True)
        points.append(p)

    out = {
        "metric": "serving_prefill_fairness_sweep",
        "concurrency": int(LEVEL),
        "fair_rows": [p["fair_rows"] for p in points],
        "decode_tokens_per_s": [p["value"] for p in points],
        "ttft_ms_p50": [p["ttft_ms_p50"] for p in points],
        "ttft_ms_p95": [p.get("ttft_ms_p95") for p in points],
        "points": points,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "points"}))
    dest = os.environ.get(
        "JLAMA_BENCH_OUT",
        os.path.join(os.path.dirname(here), "BENCH_FAIRNESS_r05.json"),
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
