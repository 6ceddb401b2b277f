from spinglass_tpu.distributed import pt_sharded, rl_sharded
