"""Model zoo: the R-CED / CR-CED fully-convolutional denoiser family."""

from fullycnnspeechenhancement_tpu.models.blocks import (  # noqa: F401
    conv_bn_relu_apply,
    conv_bn_relu_init,
)
from fullycnnspeechenhancement_tpu.models.blocked import (  # noqa: F401
    apply_blocked,
)
from fullycnnspeechenhancement_tpu.models.rced import (  # noqa: F401
    ModelDef,
    V1,
    V2,
    V3,
    get_model,
    MODEL_REGISTRY,
)
