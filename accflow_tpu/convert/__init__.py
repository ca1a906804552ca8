from accflow_tpu.convert.torch_weights import (  # noqa: F401
    convert_state_dict,
    load_accflow_checkpoint,
    load_flow_estimator_checkpoint,
    split_accflow_state,
    strip_module_prefix,
)
