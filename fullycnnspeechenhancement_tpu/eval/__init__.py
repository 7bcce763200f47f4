"""Evaluation: speech-quality metrics and the batch evaluator."""

from fullycnnspeechenhancement_tpu.eval.metrics import (  # noqa: F401
    AverageMeter,
    SDR,
    STOI,
    PESQ,
    stoi,
    sdr,
    mos_lqo,
    mos_lqo_inverse,
)
