from sod_tpu.ops.layers import (  # noqa: F401
    gelu,
    layer_norm,
    linear,
    linear_init,
    layer_norm_init,
    mlp_init,
    mlp_apply,
    trunc_normal,
)
from sod_tpu.ops.attention import multi_head_attention, self_attention_qkv  # noqa: F401
from sod_tpu.ops.resize import (  # noqa: F401
    interpolate_bilinear,
    interpolate_bicubic,
    interpolate_nearest,
    resize_shorter_edge,
)
