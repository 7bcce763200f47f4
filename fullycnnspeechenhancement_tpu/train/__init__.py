"""Training: losses, schedules, optimizer, train/eval steps, engine."""

from fullycnnspeechenhancement_tpu.train.optim import (  # noqa: F401
    noam_schedule,
    tf_adam,
)
from fullycnnspeechenhancement_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
