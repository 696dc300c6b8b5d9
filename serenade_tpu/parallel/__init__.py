from serenade_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    batch_spec,
    shard_batch,
)
from serenade_tpu.parallel.sharding import (  # noqa: F401
    infer_param_shardings,
    shard_params,
)
