from spinglass_tpu.core.problem import IsingProblem, random_spins
from spinglass_tpu.core import energy, topology, constraints
