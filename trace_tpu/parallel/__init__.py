"""Parallelism strategies for the TPU rebuild.

The reference's only production strategy is DeepSpeed ZeRO-3 data
parallelism (scripts/zero3.json; SURVEY.md §2.3).  Here the equivalents —
and the strategies the reference lacks — are first-class:

* data / tensor / frame-sequence parallel: GSPMD shardings over a
  ('data', 'model') mesh (runtime/mesh.py, re-exported here);
* expert parallel: MoE expert stacks shard over 'model' (model/moe.py);
* pipeline parallel: GPipe-style microbatch schedule over a 'stage' mesh
  axis (parallel/pipeline.py) — shard_map + ppermute, no reference analog.
"""

from trace_tpu.runtime.mesh import (  # noqa: F401
    batch_shardings,
    build_mesh,
    param_shardings,
    param_spec,
    shard_batch,
    shard_params,
)
from trace_tpu.parallel.pipeline import (  # noqa: F401
    build_pp_mesh,
    pp_decoder_forward,
    split_layers_into_stages,
)
