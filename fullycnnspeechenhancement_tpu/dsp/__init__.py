"""DSP: STFT analysis features and waveform re-synthesis.

`reference_dsp` is the float64 numpy golden implementation of the reference's
exact analysis/synthesis chain (SURVEY.md Appendix B) -- used for tests and
host-side paths.  `features`/`rebuild` are the batched, static-shape jnp
device implementations used inside jitted train/eval steps.
"""

from fullycnnspeechenhancement_tpu.dsp.windows import make_window  # noqa: F401
from fullycnnspeechenhancement_tpu.dsp import reference_dsp  # noqa: F401
from fullycnnspeechenhancement_tpu.dsp.features import (  # noqa: F401
    SpectrogramExtractor,
)
from fullycnnspeechenhancement_tpu.dsp.rebuild import (  # noqa: F401
    WaveformRebuilder,
    rebuild_audio_numpy,
)
