from eventful_transformer_tpu.ops.resize import (
    avg_pool_1d,
    avg_pool_2d,
    resize_bicubic,
    resize_bilinear,
)
