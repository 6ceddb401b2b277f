import time
import jax, numpy as np
from spinglass_tpu.core import topology
from spinglass_tpu.kernels.sparse import EllProblem
from spinglass_tpu.anneal import pt as pt_mod

N = 10000
coo = topology.sparse_random_graph_coo(N, avg_degree=6.0, dist="gaussian", seed=42)
ell = EllProblem.from_coo(N, *coo)
cfg = pt_mod.PTConfig(n_replicas=16, n_sweeps=1000, seed=42)
t0 = time.perf_counter(); res = pt_mod.run(ell, cfg); t1 = time.perf_counter()
t2 = time.perf_counter(); res = pt_mod.run(ell, cfg); t3 = time.perf_counter()
print(f"compile+run: {t1-t0:.2f}s; cached run: {t3-t2:.3f}s; best {res.best_energy:.1f}")
print(f"flips/s: {N*16*1000/(t3-t2)/1e9:.2f} G")
