from eventful_transformer_tpu.parallel.mesh import make_mesh
from eventful_transformer_tpu.parallel.sharding import (
    named_sharding,
    vit_param_spec,
    vit_param_shardings,
)
