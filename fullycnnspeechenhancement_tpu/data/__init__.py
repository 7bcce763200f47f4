"""Host data pipeline: audio I/O, manifests, SNR mixing, bucketed loading.

Replaces the reference's DataSet/Sampler/DataLoader stack
(`/root/reference/data_utils/data_loader.py`) with a TPU-appropriate
design: the host decodes, resamples and mixes raw waveforms only -- all
DSP runs on device inside the jitted step -- and batches are padded to
static bucket shapes so XLA compiles a small, fixed set of programs.
A threaded producer pipeline with prefetch replaces the reference's
per-batch joblib fan-out (which its own readme flags as unreliable,
readme.md:51).
"""

from fullycnnspeechenhancement_tpu.data.audio_io import (  # noqa: F401
    read_wav,
    write_wav,
    resample,
)
from fullycnnspeechenhancement_tpu.data.manifest import (  # noqa: F401
    ManifestEntry,
    read_manifest,
    write_manifest,
    shard_for_host,
)
from fullycnnspeechenhancement_tpu.data.mixing import mix_at_snr  # noqa: F401
from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset  # noqa: F401
from fullycnnspeechenhancement_tpu.data.loader import (  # noqa: F401
    BucketSampler,
    DataLoader,
    LoaderBatch,
)
from fullycnnspeechenhancement_tpu.data.device_cache import (  # noqa: F401
    CachedBatch,
    DeviceCacheLoader,
    DeviceCorpus,
    RotatingDeviceCacheLoader,
    build_device_corpus,
    materialize_batch,
)
