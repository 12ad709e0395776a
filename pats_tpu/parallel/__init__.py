"""SPMD scale-out: mesh construction, sharded evaluation, multi-host boot."""

from pats_tpu.parallel.mesh import make_mesh, data_parallel_sharding
