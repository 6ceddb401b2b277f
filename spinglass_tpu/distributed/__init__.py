from spinglass_tpu.distributed import pt_sharded, rl_sharded
from spinglass_tpu.distributed import model_sharded  # noqa: F401
from spinglass_tpu.distributed.coordinator import JobCoordinator, Job, JobStatus
from spinglass_tpu.distributed.workpool import WorkStealingQueue, WorkerPool
from spinglass_tpu.distributed.edge import EdgeNode, EdgeOrchestrator
from spinglass_tpu.distributed.multihost import (initialize as multihost_initialize, replica_mesh, hybrid_mesh)
