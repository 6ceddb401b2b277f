"""Train a PPO temperature controller over the vectorized annealer-env.

Run: python examples/rl_controller.py [--updates 30] [--platform cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=30)
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from spinglass_tpu.core import topology
    from spinglass_tpu.core.problem import IsingProblem
    from spinglass_tpu.rl.env import EnvConfig
    from spinglass_tpu.rl.ppo import PPOConfig, train

    n = 64
    j = topology.fully_connected(n, dist="gaussian", scale=1.0 / np.sqrt(n),
                                 seed=0)
    out = train(
        IsingProblem.from_dense(j),
        EnvConfig(n_envs=args.envs, sweeps_per_step=5, max_steps=40),
        PPOConfig(n_updates=args.updates, rollout_len=16),
        verbose=True)
    print(f"env-steps/s:       {out['env_steps_per_second']:.0f}")
    print(f"final mean best E: {out['final_mean_best_energy']:.2f}")


if __name__ == "__main__":
    main()
