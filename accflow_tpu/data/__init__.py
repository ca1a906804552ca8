from accflow_tpu.data.records import (  # noqa: F401
    CVORReader,
    CVORWriter,
    decode_flow_u16,
    encode_flow_u16,
)
from accflow_tpu.data.cvo import (  # noqa: F401
    BatchIterator,
    CVODataset,
    ConcatDataset,
    fetch_train_dataset,
    fetch_valid_dataset,
)
from accflow_tpu.data.prefetch import device_prefetch, threaded_batches  # noqa: F401
