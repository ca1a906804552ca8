from accflow_tpu.train.loss import (  # noqa: F401
    epe_metrics,
    sequence_loss_acc,
    sequence_loss_raft,
)
from accflow_tpu.train.optim import make_optimizer, onecycle_linear  # noqa: F401
