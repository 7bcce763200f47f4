#!/usr/bin/env bash
cd "$(dirname "$0")/../.." || exit 1
python -m fullycnnspeechenhancement_tpu.data.prepare.aishell_2 \
  --manifest-prefix='work/aishell_2/data/manifest.aishell_2' \
  --target-dir="${DATA_HOME:-$HOME/data}/ASR/aishell_2" \
  --tarball="${AISHELL2_TARBALL:-}" \
  --sample-rate=8000
