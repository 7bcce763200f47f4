"""TPU-native fully-convolutional speech enhancement framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
phecda-xu/FullyCNNSpeechEnhancement (R-CED / CR-CED spectral-mapping
denoisers): on-device STFT analysis, the V1/V2/V3 conv encoder-decoder
stacks, waveform re-synthesis with noisy phase, manifest-driven data
pipelines with on-the-fly SNR mixing, PESQ/STOI/SDR evaluation,
checkpointing, inference and export -- plus data-parallel training over
`jax.sharding.Mesh` device meshes, which the reference does not have.

The reference's *behavioral contract* (exact DSP numerics, layer
topology, loss, schedule, metrics; see SURVEY.md Appendix B) is the
spec; its TF-1.x Session/placeholder architecture is not.
"""

__version__ = "0.1.0"

from fullycnnspeechenhancement_tpu.config import (  # noqa: F401
    DSPConfig,
    ModelConfig,
    TrainConfig,
    DataConfig,
    EvalConfig,
    Config,
    load_ini_config,
)
