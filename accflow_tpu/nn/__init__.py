from accflow_tpu.nn.layers import (  # noqa: F401
    apply_norm,
    batch_norm,
    conv2d,
    group_norm,
    init_batch_norm,
    init_conv,
    init_group_norm,
    init_norm,
    init_zero_conv,
    instance_norm,
    relu,
    zero_conv2d,
)
