"""Dataset preparation: download/unpack corpora and emit JSONL manifests.

Covers the reference's `Work/datasets/*_prepare.py` tooling (SURVEY.md
SS2.1 components 15-19): aishell_1 (openslr-33), aishell_2 (local
tarball + gender-balanced speaker split), VoiceBank-DEMAND (pre-mixed
clean/noisy pairs), and generic noise corpora.  All use the shared
resample-and-manifest core in `common.py` with a process pool instead of
per-directory joblib fan-out.
"""

from fullycnnspeechenhancement_tpu.data.prepare.common import (  # noqa: F401
    download,
    unpack,
    md5file,
    resample_tree_entry,
)
