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


def _enable_compile_cache():
    """Opt-in persistent XLA compile cache (SPINGLASS_JAX_CACHE env var).

    Off by default: measured on the tunneled v5e, a cache hit on the dense
    headline program (278 MB serialized executable) takes 365 s wall vs a
    130 s fresh compile — shipping a big cached executable to the remote
    device is slower than recompiling from the small HLO. See
    utils.cache.enable_persistent_compile_cache."""
    from spinglass_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()


def _run_all():
    """Dense headline + sparse/pt10k/ttt/rl in extras (VERDICT.md r2 item 5:
    regressions on ANY path must be visible in the driver artifact)."""
    from spinglass_tpu.benchmarks import headline

    dense = headline.bench_dense()
    for name, fn in (("sparse", headline.bench_sparse),
                     ("pt10k", headline.bench_pt10k),
                     ("ttt", headline.bench_ttt),
                     ("rl", headline.bench_rl)):
        try:
            sub = fn()
            dense["extras"][name] = {k: sub[k] for k in
                                     ("metric", "value", "unit")}
            dense["extras"][name].update(sub["extras"])
        except Exception as e:  # one path failing must not hide the rest
            dense["extras"][name] = {"error": f"{type(e).__name__}: {e}"}
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
