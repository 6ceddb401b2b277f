"""Headline benchmark: spin-flips/sec/chip on spin-glass annealing.

Default (--all, implicit): the dense fused-Pallas sweep headline with the
sparse / pt10k / time-to-target / RL paths in extras, so a regression on
ANY path is visible in the driver artifact. Individual flags run one path.

Benchmark bodies live in spinglass_tpu.benchmarks.headline (shared with the
TPU performance quality gate so both hit the same persistent-compile-cache
entries). Prints ONE JSON line:

    {"metric": "...", "value": ..., "unit": "...", "vs_baseline": ...,
     "extras": {...}}

Baseline: the reference has no published throughput numbers (BASELINE.md);
vs_baseline for throughput metrics is the multiple of an ASSUMED 1e6
flips/s CPU reference (label it as such when quoting), and for wall-clock
metrics the multiple vs the reference's "sub-second for 10k+ variables"
claim read as 1 s.
"""

import argparse
import json
import os
import subprocess
import sys

# Per-path wall budget for --all. Through the tunnel, a single remote
# compile occasionally stalls for 10+ minutes (measured: the same ttt
# program compiled in ~90 s on one run and never finished within 590 s on
# the next); a bounded subprocess turns such a stall into a recorded error
# instead of hanging the whole artifact run.
PATH_TIMEOUT_S = int(os.environ.get("SPINGLASS_BENCH_TIMEOUT", "480"))


def _enable_compile_cache():
    """Opt-in persistent XLA compile cache (SPINGLASS_JAX_CACHE env var).

    Off by default: measured on the tunneled v5e, a cache hit on the dense
    headline program (278 MB serialized executable) takes 365 s wall vs a
    130 s fresh compile — shipping a big cached executable to the remote
    device is slower than recompiling from the small HLO. See
    utils.cache.enable_persistent_compile_cache."""
    from spinglass_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()


def _run_path_subprocess(flag: str) -> dict:
    """Run one bench path in a bounded subprocess and parse its JSON line.
    Isolation bounds tunnel compile stalls AND TPU-worker crashes to the
    one path (each subprocess gets a fresh backend)."""
    self_path = os.path.abspath(globals().get("__file__", "bench.py"))
    try:
        proc = subprocess.run(
            [sys.executable, self_path, flag],
            capture_output=True, text=True, timeout=PATH_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {PATH_TIMEOUT_S}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {"error": f"exit {proc.returncode}: "
                     + " | ".join(tail[-3:])[:500]}


def _run_all():
    """Dense headline + sparse/pt10k/ttt/rl in extras (VERDICT.md r2 item 5:
    regressions on ANY path must be visible in the driver artifact). Each
    path runs in its own time-bounded subprocess."""
    dense = _run_path_subprocess("--dense")
    if "error" in dense:
        dense = {"metric": "spin_flips_per_sec_per_chip", "value": 0.0,
                 "unit": "flips/s", "vs_baseline": 0.0,
                 "extras": {"error": dense["error"]}}
    dense.setdefault("extras", {})
    for name, flag in (("sparse", "--sparse"), ("pt10k", "--pt10k"),
                       ("ttt", "--ttt"), ("rl", "--rl")):
        sub = _run_path_subprocess(flag)
        if "error" in sub:
            dense["extras"][name] = sub
        else:
            dense["extras"][name] = {k: sub[k] for k in
                                     ("metric", "value", "unit")}
            dense["extras"][name].update(sub.get("extras", {}))
    return dense


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true",
                    help="dense throughput only (old default)")
    ap.add_argument("--sparse", action="store_true",
                    help="sparse ELL throughput instead of dense")
    ap.add_argument("--pt10k", action="store_true",
                    help="full 10k-spin PT wall-clock")
    ap.add_argument("--rl", action="store_true",
                    help="PPO controller env-steps/s")
    ap.add_argument("--ttt", action="store_true",
                    help="time-to-target-energy on a planted 10k instance")
    ap.add_argument("--all", action="store_true",
                    help="(default) run all benches; dense headline with "
                         "the others in extras")
    args = ap.parse_args()
    # honor JAX_PLATFORMS=cpu even where a sitecustomize sets the platform
    # programmatically (required for the env var to reach the --all
    # subprocesses on CPU smoke runs)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    _enable_compile_cache()

    from spinglass_tpu.benchmarks import headline

    if args.sparse:
        print(json.dumps(headline.bench_sparse()))
    elif args.pt10k:
        print(json.dumps(headline.bench_pt10k()))
    elif args.rl:
        print(json.dumps(headline.bench_rl()))
    elif args.ttt:
        print(json.dumps(headline.bench_ttt()))
    elif args.dense:
        print(json.dumps(headline.bench_dense()))
    else:
        print(json.dumps(_run_all()))


if __name__ == "__main__":
    main()
