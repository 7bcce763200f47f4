"""Pallas TPU kernels for the hot ops."""

from fullycnnspeechenhancement_tpu.ops.pallas_rced import (  # noqa: F401
    fused_inference_forward,
    fold_bn_inference,
)
