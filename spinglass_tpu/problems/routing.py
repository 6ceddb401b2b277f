"""TSP / VRP → Ising encoders (reference problems/routing.py:35-677).

TSP uses the position encoding x_{city,pos} (n^2 spins): tour length becomes
binary-quadratic couplings between consecutive positions
(routing.py:275-294), plus cardinality-1 constraints per city and per position
(routing.py:296-328) with the reference's sqrt(n/50) penalty auto-scaling for
n > 50 (routing.py:237-241). All terms are generated vectorized and scattered
once.

VRP uses x_{customer,pos,vehicle} route-position encoding (n*P*K spins):
per-vehicle tours through assigned positions, each customer served exactly
once, depot implicit at route ends (a TPU-friendlier reformulation of the
reference's arc encoding x_{i,j,k}, routing.py:416-569 — same capability,
quadratically fewer spins than n^2*K arcs)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from spinglass_tpu.core import constraints as C
from spinglass_tpu.core.problem import IsingProblem
from spinglass_tpu.problems.base import ProblemSolution, ProblemTemplate, spins_to_binary


def distance_matrix(locations: np.ndarray, metric: str = "euclidean") -> np.ndarray:
    """O(n^2) vectorized distances (reference routing.py:244-269)."""
    loc = np.asarray(locations, dtype=np.float64)
    diff = loc[:, None, :] - loc[None, :, :]
    if metric == "euclidean":
        return np.sqrt((diff ** 2).sum(-1))
    if metric == "manhattan":
        return np.abs(diff).sum(-1)
    if metric == "chebyshev":
        return np.abs(diff).max(-1)
    raise ValueError(metric)


class TSPProblem(ProblemTemplate):
    """Traveling salesman (reference routing.py:183-403)."""

    name = "tsp"

    def __init__(self, locations: Optional[np.ndarray] = None,
                 distances: Optional[np.ndarray] = None,
                 metric: str = "euclidean"):
        super().__init__()
        self.locations = None if locations is None else np.asarray(locations)
        self.metric = metric
        self._distances = distances

    def generate_random_instance(self, n_cities: int = 10, seed: int = 0,
                                 box: float = 100.0) -> None:
        rng = np.random.default_rng(seed)
        self.locations = rng.uniform(0, box, (n_cities, 2))
        self._distances = None

    @property
    def n_cities(self) -> int:
        if self._distances is not None:
            return self._distances.shape[0]
        return len(self.locations)

    @property
    def distances(self) -> np.ndarray:
        if self._distances is None:
            self._distances = distance_matrix(self.locations, self.metric)
        return self._distances

    def spin_index(self, city: int, pos: int) -> int:
        return city * self.n_cities + pos

    def encode_to_ising(self, penalty_weight: Optional[float] = None,
                        **params) -> IsingProblem:
        n = self.n_cities
        d = self.distances
        if penalty_weight is None:
            # strong enough to dominate tour-length gains, auto-scaled like
            # reference routing.py:237-241
            penalty_weight = 2.0 * float(d.max()) * max(1.0, np.sqrt(n / 50.0))

        # objective: sum_p sum_{c1 != c2} d[c1,c2] x[c1,p] x[c2,(p+1)%n]
        c1, c2, p = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                indexing="ij")
        off = c1 != c2
        qi = (c1 * n + p)[off].ravel()
        qj = (c2 * n + (p + 1) % n)[off].ravel()
        qv = np.broadcast_to(d[:, :, None], (n, n, n))[off].ravel()
        obj = C.binary_quadratic_terms(qi, qj, qv)

        self.compiler = C.ConstraintCompiler()
        for city in range(n):
            idx = city * n + np.arange(n)
            self.compiler.add(C.CardinalityConstraint(
                name=f"city_{city}_once", indices=idx, k=1,
                weight=penalty_weight))
        for pos in range(n):
            idx = np.arange(n) * n + pos
            self.compiler.add(C.CardinalityConstraint(
                name=f"pos_{pos}_once", indices=idx, k=1,
                weight=penalty_weight))
        t = C.Terms.concat([obj, self.compiler.compile()])
        self._problem = IsingProblem.from_terms(
            n * n, t.quad_i, t.quad_j, t.quad_v, t.lin_i, t.lin_v)
        return self._problem

    def tour_length(self, tour: np.ndarray) -> float:
        d = self.distances
        return float(d[tour, np.roll(tour, -1)].sum())

    def decode_solution(self, spins: np.ndarray) -> ProblemSolution:
        """Greedy-repair decode (reference routing.py:330-403): per position
        pick the assigned city; duplicate/missing cities repaired greedily."""
        n = self.n_cities
        x = spins_to_binary(spins)[: n * n].reshape(n, n)  # [city, pos]
        raw_violations = self.compiler.violation_report(np.asarray(spins)[: n * n])
        tour = np.full(n, -1, dtype=np.int64)
        used = np.zeros(n, dtype=bool)
        for pos in range(n):
            cands = np.nonzero(x[:, pos])[0]
            cands = [c for c in cands if not used[c]]
            if cands:
                tour[pos] = cands[0]
                used[cands[0]] = True
        missing = [c for c in range(n) if not used[c]]
        for pos in range(n):
            if tour[pos] < 0:
                tour[pos] = missing.pop(0)
        length = self.tour_length(tour)
        clean = bool(np.all(x.sum(axis=0) == 1) and np.all(x.sum(axis=1) == 1))
        return ProblemSolution(
            objective_value=length,
            variables={"tour": tour, "assignment": x},
            is_feasible=True,  # repaired tour is always valid
            constraint_violations=raw_violations,
            metadata={"clean_decode": clean},
        )

    def validate_tour(self, tour: np.ndarray) -> bool:
        return sorted(np.asarray(tour).tolist()) == list(range(self.n_cities))


@dataclass
class Vehicle:
    capacity: float = float("inf")


class VRPProblem(ProblemTemplate):
    """Capacitated vehicle routing (reference routing.py:406-677).

    Encoding: x[c, p, k] — customer c is the p-th stop of vehicle k's route
    (P positions per vehicle). Each vehicle leaves/returns to the depot
    (node 0). n_spins = n_customers * P * K."""

    name = "vrp"

    def __init__(self, locations: Optional[np.ndarray] = None,
                 demands: Optional[np.ndarray] = None,
                 n_vehicles: int = 2, capacity: float = float("inf"),
                 route_len: Optional[int] = None):
        super().__init__()
        self.locations = None if locations is None else np.asarray(locations)
        self.demands = None if demands is None else np.asarray(demands)
        self.n_vehicles = n_vehicles
        self.capacity = capacity
        self.route_len = route_len
        self._distances = None

    def generate_random_instance(self, n_customers: int = 8, n_vehicles: int = 2,
                                 seed: int = 0, box: float = 100.0,
                                 capacity: float = 0.0) -> None:
        rng = np.random.default_rng(seed)
        # node 0 is the depot
        self.locations = rng.uniform(0, box, (n_customers + 1, 2))
        self.demands = rng.uniform(1, 10, n_customers)
        self.n_vehicles = n_vehicles
        self.capacity = capacity if capacity > 0 else (
            1.6 * self.demands.sum() / n_vehicles)
        self._distances = None

    @property
    def n_customers(self) -> int:
        return len(self.locations) - 1

    @property
    def distances(self) -> np.ndarray:
        if self._distances is None:
            self._distances = distance_matrix(self.locations)
        return self._distances

    def _dims(self):
        n = self.n_customers
        k = self.n_vehicles
        p = self.route_len or int(np.ceil(n / k)) + 1
        return n, p, k

    def spin_index(self, c: int, p: int, k: int) -> int:
        n, pp, kk = self._dims()
        return (c * pp + p) * kk + k

    def encode_to_ising(self, penalty_weight: Optional[float] = None,
                        **params) -> IsingProblem:
        n, pp, kk = self._dims()
        d = self.distances  # [n+1, n+1], row/col 0 = depot
        if penalty_weight is None:
            penalty_weight = 2.0 * float(d.max()) * max(1.0, np.sqrt(n / 50.0))
        n_spins = n * pp * kk

        # travel cost: depot->first stop, consecutive stops, last->depot is
        # approximated by depot links on every position boundary when adjacent
        # positions are empty — we charge: depot->c for p=0, c1->c2 for
        # consecutive (p, p+1) same vehicle, c->depot for p=P-1.
        qi_l, qj_l, qv_l, li_l, lv_l = [], [], [], [], []
        cs = np.arange(n)
        for k in range(kk):
            # linear: depot legs
            li_l.append(np.array([self.spin_index(c, 0, k) for c in cs]))
            lv_l.append(d[0, 1:][cs])
            li_l.append(np.array([self.spin_index(c, pp - 1, k) for c in cs]))
            lv_l.append(d[1:, 0][cs])
            # quadratic: consecutive stops
            for p in range(pp - 1):
                c1, c2 = np.meshgrid(cs, cs, indexing="ij")
                off = c1 != c2
                qi_l.append(np.array(
                    [(a * pp + p) * kk + k for a in c1[off].ravel()]))
                qj_l.append(np.array(
                    [(b * pp + p + 1) * kk + k for b in c2[off].ravel()]))
                qv_l.append(d[1:, 1:][c1[off], c2[off]].ravel())
        obj = C.binary_quadratic_terms(
            np.concatenate(qi_l), np.concatenate(qj_l), np.concatenate(qv_l),
            np.concatenate(li_l), np.concatenate(lv_l))

        self.compiler = C.ConstraintCompiler()
        # each customer served exactly once (over all positions/vehicles)
        for c in range(n):
            idx = np.array([self.spin_index(c, p, k)
                            for p in range(pp) for k in range(kk)])
            self.compiler.add(C.CardinalityConstraint(
                name=f"cust_{c}_once", indices=idx, k=1,
                weight=penalty_weight))
        # each (position, vehicle) slot holds at most one customer:
        # inequality via cardinality toward 0/1 — use soft pairwise penalty
        for k in range(kk):
            for p in range(pp):
                idx = np.array([self.spin_index(c, p, k) for c in range(n)])
                # penalize pairs: sum over pairs x_i x_j  (0 when <=1 chosen)
                iu, ju = np.triu_indices(n, k=1)
                self.compiler.add(C.CustomConstraint(
                    name=f"slot_{k}_{p}_unique", weight=penalty_weight,
                    terms_fn=lambda idx=idx, iu=iu, ju=ju: C.binary_quadratic_terms(
                        idx[iu], idx[ju], np.full(len(iu), 2.0)),
                    violation_fn=lambda s, idx=idx: max(
                        0.0, float((np.asarray(s)[idx] > 0).sum() - 1)),
                ))
        t = C.Terms.concat([obj, self.compiler.compile()])
        self._problem = IsingProblem.from_terms(
            n_spins, t.quad_i, t.quad_j, t.quad_v, t.lin_i, t.lin_v)
        return self._problem

    def decode_solution(self, spins: np.ndarray) -> ProblemSolution:
        n, pp, kk = self._dims()
        x = spins_to_binary(spins)[: n * pp * kk].reshape(n, pp, kk)
        routes = {k: [] for k in range(kk)}
        served = np.zeros(n, dtype=bool)
        for k in range(kk):
            for p in range(pp):
                cands = [c for c in np.nonzero(x[:, p, k])[0] if not served[c]]
                if cands:
                    routes[k].append(int(cands[0]))
                    served[cands[0]] = True
        # greedy repair: unserved customers to least-loaded vehicle
        for c in np.nonzero(~served)[0]:
            k = min(routes, key=lambda kk_: len(routes[kk_]))
            routes[k].append(int(c))
        d = self.distances
        total, loads = 0.0, {}
        for k, route in routes.items():
            load = float(self.demands[route].sum()) if route else 0.0
            loads[k] = load
            if route:
                nodes = [0] + [c + 1 for c in route] + [0]
                total += float(sum(d[a, b] for a, b in zip(nodes, nodes[1:])))
        feasible = all(l <= self.capacity + 1e-9 for l in loads.values())
        return ProblemSolution(
            objective_value=total,
            variables={"routes": routes, "loads": loads},
            is_feasible=feasible,
            constraint_violations={
                f"vehicle_{k}_overload": max(0.0, l - self.capacity)
                for k, l in loads.items()},
        )
