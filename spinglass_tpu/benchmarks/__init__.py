from spinglass_tpu.benchmarks.runner import (
    BenchmarkRunner, BenchmarkCase, BenchmarkResult, standard_suite,
)
