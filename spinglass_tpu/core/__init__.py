try:
    from spinglass_tpu.core.problem import IsingProblem, random_spins
    from spinglass_tpu.core import energy, topology, constraints
    from spinglass_tpu.core.cluster import (wolff_update, wolff_sweep,
                                            SwendsenWang)
except ImportError:  # no jax: only the stdlib-minimal tier is available
    pass
from spinglass_tpu.core import minimal
