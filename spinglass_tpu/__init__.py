"""spinglass_tpu — a TPU-native spin-glass annealing + RL framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
``danieleschmidt/spin-glass-anneal-rl`` (see SURVEY.md): combinatorial problems
compile to Ising/QUBO models, batched Monte-Carlo annealers (SA, parallel
tempering) minimize them with MXU-resident sweeps, and a PPO/DQN controller
learns temperature schedules over the annealer-as-environment.
"""

from spinglass_tpu.core.problem import IsingProblem, random_spins
from spinglass_tpu.core.energy import (
    energy, local_fields, delta_energy, magnetization,
)
from spinglass_tpu.anneal.sa import SAConfig, anneal, anneal_scan
from spinglass_tpu.anneal.schedules import ScheduleConfig, ScheduleType
from spinglass_tpu.anneal.result import AnnealResult

__version__ = "0.1.0"


def get_available_features() -> dict:
    """Feature detection mirroring the reference package root
    (spin_glass_rl/__init__.py:70-88)."""
    import jax

    backend = jax.default_backend()
    return {
        "backend": backend,
        "tpu": backend == "tpu",
        "n_devices": jax.device_count(),
        "pallas_kernels": backend == "tpu",
        "annealing": True,
        "parallel_tempering": True,
        "problems": True,
        "rl": True,
    }
