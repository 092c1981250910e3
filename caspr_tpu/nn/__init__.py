from .core import (
    linear_init,
    linear,
    conv1x1_init,
    conv1x1,
    group_norm_init,
    group_norm,
    normal_init_like,
    count_params,
)
