from spinglass_tpu.problems.base import ProblemTemplate, ProblemSolution
from spinglass_tpu.problems.maxcut import MaxCutProblem
from spinglass_tpu.problems.routing import (TSPProblem, VRPProblem,
                                            VRPArcProblem, distance_matrix)
from spinglass_tpu.problems.scheduling import (
    SchedulingProblem, JobShopScheduling, Task, Agent,
)
from spinglass_tpu.problems.resource import (
    ResourceAllocationProblem, Resource, Demand,
)
from spinglass_tpu.problems.coordination import (
    CoordinationProblem, CoordAgent, CoordTask,
)
from spinglass_tpu.problems.qap import QuadraticAssignmentProblem
from spinglass_tpu.problems.simple_scheduler import SimpleScheduler

PROBLEM_REGISTRY = {
    "maxcut": MaxCutProblem,
    "tsp": TSPProblem,
    "vrp": VRPProblem,
    "vrp_arc": VRPArcProblem,
    "scheduling": SchedulingProblem,
    "jobshop": JobShopScheduling,
    "resource": ResourceAllocationProblem,
    "coordination": CoordinationProblem,
    "qap": QuadraticAssignmentProblem,
    "simple_scheduler": SimpleScheduler,
}
