"""Serving throughput-vs-concurrency curve.

Runs scripts/bench_serving.py once per concurrency level (each in a fresh
process so HBM is clean; the persistent XLA compile cache carries the
compiled variants across points) and writes one JSON artifact with the full
curve — the data the `--batch-slots` default is chosen from.

Env: JLAMA_BENCH_CURVE (default "1,2,4,8,16"), JLAMA_BENCH_MODEL/QUANT/
PROMPT/TOKENS passed through, JLAMA_BENCH_OUT for the artifact path.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

LEVELS = [int(x) for x in os.environ.get("JLAMA_BENCH_CURVE", "1,2,4,8,16").split(",")]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    points = []
    for n in LEVELS:
        env = dict(os.environ)
        env["JLAMA_BENCH_REQS"] = str(n)
        env.pop("JLAMA_BENCH_OUT", None)
        print(f"--- concurrency {n} ---", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench_serving.py")],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"concurrency {n} failed rc={proc.returncode}")
        point = json.loads(line)
        print(json.dumps(point), flush=True)
        points.append(point)

    best = max(points, key=lambda p: p["value"])
    out = {
        "metric": points[0]["metric"].replace("serving_", "serving_curve_"),
        "unit": "tokens/s",
        "levels": [p["concurrency"] for p in points],
        "decode_tokens_per_s": [p["value"] for p in points],
        "ttft_ms_p50": [p["ttft_ms_p50"] for p in points],
        "inter_token_ms_p95": [p["inter_token_ms_p95"] for p in points],
        "vs_baseline": [p["vs_baseline"] for p in points],
        "knee_concurrency": best["concurrency"],
        "knee_tokens_per_s": best["value"],
        "sol_tokens_per_s": points[0]["sol_tokens_per_s"],
        "prompt_tokens": points[0]["prompt_tokens"],
        "decode_tokens": points[0]["decode_tokens"],
        "points": points,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "points"}))
    path = os.environ.get("JLAMA_BENCH_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
