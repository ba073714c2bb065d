"""Cold- vs warm-cache time-to-first-result suite (round-5 item: make
cold-start latency a TRACKED metric instead of an anecdote).

The transform itself runs in ~0.1 s but a fresh process pays a remote
Mosaic compile through the axon tunnel; the persistent compilation cache
(benchlib.setup_compile_cache) is supposed to amortise that across
processes.  This suite measures exactly what a user pays, per target:

  cold  — child process with an EMPTY compilation-cache dir (true first
          compile of the current kernels);
  warm  — child process against the repo cache immediately after an
          identical child populated it (the steady state every rerun,
          bench invocation, and validation sweep sees).

Three child runs per target (cold, populate, warm); each child prints its
own first-result segmentation (tools/_coldstart_child.py).  One JSON row
per target appends to TPU_VALIDATION.jsonl (suite "coldstart").

The reference has no counterpart — CUDA kernels JIT in milliseconds; this
is a pure TPU-stack cost and the repo's worst UX number, so it is tracked
like any other benchmark.

Usage: python tools/coldstart.py [target ...]   (default: all three)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_REPO, "tools", "_coldstart_child.py")
REPORT = os.path.join(_REPO, "TPU_VALIDATION.jsonl")

TARGETS = ("ntt128", "sumcheck", "bb31")


def _run_child(target: str, cache_dir: str | None) -> dict:
    env = dict(os.environ)
    if cache_dir is not None:
        env["BNTT_CACHE_DIR"] = cache_dir
    else:
        env.pop("BNTT_CACHE_DIR", None)
    r = subprocess.run(
        [sys.executable, _CHILD, target], env=env, cwd=_REPO,
        capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(
            f"coldstart child {target} failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    targets = sys.argv[1:] or list(TARGETS)
    for target in targets:
        with tempfile.TemporaryDirectory(prefix="bntt_coldcache_") as td:
            cold = _run_child(target, td)
        populate = _run_child(target, None)    # fills/refreshes repo cache
        warm = _run_child(target, None)
        row = {"suite": "coldstart", "target": target, "log": cold["log"],
               "cold_first_result_s": cold["first_result_s"],
               "warm_first_result_s": warm["first_result_s"],
               "warm_setup_s": warm["setup_s"],
               "populate_first_result_s": populate["first_result_s"],
               "ts": round(time.time(), 1)}
        with open(REPORT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
