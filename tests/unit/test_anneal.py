"""SA driver, schedules, PT, and result tests (reference assertion ideas from
tests/unit/test_annealing_gpu_annealer.py and test_annealing_components.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinglass_tpu.anneal import pt as PT
from spinglass_tpu.anneal import sa as SA
from spinglass_tpu.anneal import schedules as S
from spinglass_tpu.anneal.result import AnnealResult
from spinglass_tpu.core import energy as E
from spinglass_tpu.core import topology
from spinglass_tpu.core.problem import IsingProblem


def _problem(n=32, seed=0):
    j = topology.fully_connected(n, dist="binary", seed=seed)
    return IsingProblem.from_dense(j, np.zeros(n))


class TestSchedules:
    @pytest.mark.parametrize("stype", [
        S.ScheduleType.LINEAR, S.ScheduleType.EXPONENTIAL,
        S.ScheduleType.GEOMETRIC, S.ScheduleType.LOGARITHMIC,
        S.ScheduleType.POWER_LAW, S.ScheduleType.FAST, S.ScheduleType.BOLTZMANN,
    ])
    def test_monotone_decreasing_and_bounded(self, stype):
        cfg = S.ScheduleConfig(schedule_type=stype, initial_temp=10.0,
                               final_temp=0.01, total_sweeps=200)
        traj = np.asarray(S.schedule_trajectory(cfg))
        assert traj[0] == pytest.approx(10.0, rel=1e-5)
        assert np.all(np.diff(traj) <= 1e-6)
        assert np.all(traj >= 0.01 - 1e-6)

    def test_exponential_hits_endpoints(self):
        cfg = S.ScheduleConfig(S.ScheduleType.EXPONENTIAL, initial_temp=5.0,
                               final_temp=0.05, total_sweeps=100)
        traj = np.asarray(S.schedule_trajectory(cfg))
        assert traj[-1] == pytest.approx(0.05, rel=1e-3)

    def test_adaptive_reacts_to_acceptance(self):
        cfg = S.ScheduleConfig(S.ScheduleType.ADAPTIVE, initial_temp=1.0,
                               final_temp=0.001, alpha=1.0, adaptation_rate=0.1,
                               ema_decay=0.0)
        st = S.init_state(cfg)
        hot = S.update(cfg, st, jnp.asarray(0), jnp.asarray(0.9))
        cold = S.update(cfg, st, jnp.asarray(0), jnp.asarray(0.1))
        assert float(hot.temp) > float(st.temp)
        assert float(cold.temp) < float(st.temp)

    def test_custom_schedule(self):
        cfg = S.ScheduleConfig(S.ScheduleType.CUSTOM, final_temp=0.0,
                               custom_fn=lambda t: 5.0 / (1.0 + t))
        assert float(S.temperature_at(cfg, 4)) == pytest.approx(1.0)

    def test_constant(self):
        cfg = S.ScheduleConfig(S.ScheduleType.CONSTANT, initial_temp=2.5,
                               final_temp=0.0)
        traj = np.asarray(S.schedule_trajectory(cfg, 10))
        assert np.all(traj == 2.5)


class TestSA:
    def test_finds_ferromagnetic_ground_state(self):
        """All-up/all-down ground state of a ferromagnet must be found."""
        n = 16
        j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p = IsingProblem.from_dense(j)
        cfg = SA.SAConfig(n_sweeps=300, n_replicas=16,
                          schedule=S.ScheduleConfig(initial_temp=5.0,
                                                    final_temp=0.01,
                                                    alpha=0.98),
                          use_pallas="never", seed=1)
        res = SA.anneal(p, cfg)
        ground = -0.5 * n * (n - 1) * 1.0
        assert res.best_energy == pytest.approx(ground, rel=1e-5)
        assert abs(np.sum(res.best_spins)) == n  # fully aligned

    def test_reproducible_under_seed(self):
        """Fixed seed → identical result (reference
        test_annealing_gpu_annealer.py:222)."""
        p = _problem(24, seed=3)
        cfg = SA.SAConfig(n_sweeps=100, n_replicas=8, use_pallas="never", seed=7)
        r1 = SA.anneal(p, cfg)
        r2 = SA.anneal(p, cfg)
        assert r1.best_energy == r2.best_energy
        np.testing.assert_array_equal(r1.best_spins, r2.best_spins)
        np.testing.assert_allclose(r1.energy_history, r2.energy_history)

    def test_energy_decreases(self):
        p = _problem(32, seed=4)
        cfg = SA.SAConfig(n_sweeps=400, n_replicas=8, use_pallas="never", seed=2)
        res = SA.anneal(p, cfg)
        assert res.energy_history[-1] <= res.energy_history[0]
        assert res.best_energy <= res.energy_history[0]

    def test_best_energy_consistent_with_spins(self):
        p = _problem(20, seed=5)
        cfg = SA.SAConfig(n_sweeps=100, n_replicas=4, use_pallas="never")
        res = SA.anneal(p, cfg)
        s = np.zeros(p.n_padded)
        s[:p.n_spins] = res.best_spins
        s[p.n_spins:] = 1.0
        e = float(E.energy(p, jnp.asarray(s)))
        assert e == pytest.approx(res.best_energy, rel=1e-4, abs=1e-3)

    def test_zero_sweeps(self):
        p = _problem(16)
        cfg = SA.SAConfig(n_sweeps=0, n_replicas=2, use_pallas="never")
        res = SA.anneal(p, cfg)
        assert res.n_sweeps == 0

    def test_colored_method_on_grid(self, grid_problem):
        cfg = SA.SAConfig(n_sweeps=200, n_replicas=8, sweep_method="colored",
                          use_pallas="never", seed=0,
                          schedule=S.ScheduleConfig(initial_temp=3.0,
                                                    final_temp=0.05))
        res = SA.anneal(grid_problem, cfg)
        # 8x8 FM grid ground state energy = -n_edges = -112
        assert res.best_energy == pytest.approx(-112.0, rel=1e-5)
        assert "colored" in res.algorithm

    def test_anneal_scan_fully_jitted(self):
        p = _problem(16)
        cfg = SA.SAConfig(n_sweeps=100, n_replicas=4, record_interval=25,
                          use_pallas="never")
        state, hist = SA.anneal_scan(p, cfg)
        assert hist["best_energy"].shape == (4,)
        assert np.all(np.isfinite(np.asarray(hist["best_energy"])))


class TestPT:
    def test_ladder_shapes(self):
        for kind in ("geometric", "linear", "exponential"):
            cfg = PT.PTConfig(n_replicas=8, ladder=kind, min_temp=0.1,
                              max_temp=5.0)
            t = PT.temperature_ladder(cfg)
            assert t.shape == (8,)
            assert t[0] == pytest.approx(0.1, rel=1e-5)
            assert t[-1] == pytest.approx(5.0, rel=1e-5)
            assert np.all(np.diff(t) > 0)

    def test_exchange_probability_math(self, key):
        """An exchange where the hot replica has LOWER energy is always
        accepted (log_p > 0); slot permutation stays a valid permutation."""
        p = _problem(16)
        cfg = PT.PTConfig(n_replicas=4, use_pallas="never")
        state = PT.init_state(p, cfg)
        betas = jnp.asarray([2.0, 1.0, 0.5, 0.25])
        # rig energies: slot1 (hotter) lower energy than slot0 → always swap
        state = state.replace(energy=jnp.asarray([10.0, -10.0, 0.0, 0.0]))
        new = PT.exchange_step(state, betas, jnp.asarray(0), key)
        slot = np.asarray(new.slot)
        assert sorted(slot.tolist()) == [0, 1, 2, 3]
        assert slot[0] == 1 and slot[1] == 0  # pair (0,1) swapped

    def test_rejected_exchange_keeps_slots(self, key):
        p = _problem(16)
        cfg = PT.PTConfig(n_replicas=4, use_pallas="never")
        state = PT.init_state(p, cfg)
        betas = jnp.asarray([2.0, 1.0, 0.5, 0.25])
        # hot replica much HIGHER energy: log_p = (2-1)*(E0-E1) = -2000 → reject
        state = state.replace(energy=jnp.asarray([-1000.0, 1000.0, -1000.0, 1000.0]))
        new = PT.exchange_step(state, betas, jnp.asarray(0), key)
        np.testing.assert_array_equal(np.asarray(new.slot), np.arange(4))
        assert np.asarray(new.exch_attempts)[0] == 1
        assert np.asarray(new.exch_accepts)[0] == 0

    def test_pt_run_finds_ground_state(self):
        n = 16
        j = topology.fully_connected(n, dist="ferromagnetic", scale=1.0)
        p = IsingProblem.from_dense(j)
        cfg = PT.PTConfig(n_replicas=8, n_sweeps=300, min_temp=0.05,
                          max_temp=5.0, exchange_interval=5,
                          use_pallas="never", seed=0)
        res = PT.run(p, cfg)
        assert res.best_energy == pytest.approx(-0.5 * n * (n - 1), rel=1e-5)
        rates = PT.exchange_rate_summary(res)
        assert 0.0 <= rates["mean_exchange_rate"] <= 1.0

    def test_pt_reproducible(self):
        p = _problem(20, seed=9)
        cfg = PT.PTConfig(n_replicas=4, n_sweeps=100, use_pallas="never", seed=5)
        r1, r2 = PT.run(p, cfg), PT.run(p, cfg)
        assert r1.best_energy == r2.best_energy
        np.testing.assert_array_equal(r1.best_spins, r2.best_spins)


class TestResult:
    def test_save_load_roundtrip(self, tmp_path):
        res = AnnealResult(
            best_spins=np.array([1.0, -1.0]), best_energy=-1.5,
            replica_best_energy=np.array([-1.5, -1.0]),
            energy_history=np.array([-1.0, -1.5]),
            mean_energy_history=np.array([-0.5, -1.2]),
            temperature_history=np.array([1.0, 0.5]),
            acceptance_history=np.array([0.5, 0.3]),
            n_sweeps=100, n_replicas=2, total_time=0.1, algorithm="sa",
            seed=42)
        path = str(tmp_path / "res.npz")
        res.save(path)
        r2 = AnnealResult.load(path)
        assert r2.best_energy == res.best_energy
        assert r2.seed == 42
        np.testing.assert_array_equal(r2.best_spins, res.best_spins)

    def test_rejects_nonfinite(self):
        with pytest.raises(ValueError):
            AnnealResult(
                best_spins=np.array([1.0]), best_energy=float("nan"),
                replica_best_energy=np.array([1.0]),
                energy_history=np.array([]), mean_energy_history=np.array([]),
                temperature_history=np.array([]),
                acceptance_history=np.array([]))


class TestLadderTuning:
    def test_tuned_ladder_reduces_rate_spread(self):
        """Feedback-optimized ladder (arXiv:1006.4247) should equalize
        pairwise exchange rates vs the geometric default on an SK glass."""
        import numpy as np

        from spinglass_tpu.anneal import pt as pt_mod
        from spinglass_tpu.core import topology
        from spinglass_tpu.core.problem import IsingProblem

        n = 48
        j = topology.fully_connected(n, dist="gaussian",
                                     scale=1.0 / np.sqrt(n), seed=9)
        p = IsingProblem.from_dense(j)
        cfg = pt_mod.PTConfig(n_replicas=8, n_sweeps=400,
                              exchange_interval=5, min_temp=0.2,
                              max_temp=8.0, use_pallas="never", seed=0)
        base = pt_mod.run(p, cfg)
        base_rates = np.asarray(base.metadata["exchange_rates"])
        temps, diag = pt_mod.tune_ladder(p, cfg, n_pilot_sweeps=200,
                                         n_iters=2)
        tuned = pt_mod.run(p, cfg, ladder_override=temps)
        tuned_rates = np.asarray(tuned.metadata["exchange_rates"])
        assert temps.shape == (8,)
        assert np.all(np.diff(temps) > 0)  # strictly increasing ladder
        # spread (max-min) should not get worse; usually shrinks a lot
        assert tuned_rates.max() - tuned_rates.min() <= (
            base_rates.max() - base_rates.min()) + 0.05
        # endpoints preserved
        np.testing.assert_allclose([temps[0], temps[-1]], [0.2, 8.0],
                                   rtol=1e-5)

    def test_ladder_override_plumbs_through(self):
        import numpy as np

        from spinglass_tpu.anneal import pt as pt_mod
        from spinglass_tpu.core import topology
        from spinglass_tpu.core.problem import IsingProblem

        j = topology.fully_connected(16, dist="binary", seed=2)
        p = IsingProblem.from_dense(j)
        custom = np.geomspace(0.5, 3.0, 4).astype(np.float32)
        cfg = pt_mod.PTConfig(n_replicas=4, n_sweeps=40, exchange_interval=10,
                              use_pallas="never", seed=0)
        res = pt_mod.run(p, cfg, ladder_override=custom)
        np.testing.assert_allclose(res.metadata["ladder"], custom, rtol=1e-6)
        assert "slot_energy" in res.metadata
