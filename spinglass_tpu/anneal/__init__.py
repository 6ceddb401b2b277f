from spinglass_tpu.anneal.sa import SAConfig, SAState, anneal, anneal_scan
from spinglass_tpu.anneal.schedules import ScheduleConfig, ScheduleType
from spinglass_tpu.anneal.result import AnnealResult
from spinglass_tpu.anneal import pt
from spinglass_tpu.anneal.engines import make_engine, SweepEngine
