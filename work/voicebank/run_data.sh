#!/usr/bin/env bash
cd "$(dirname "$0")/../.." || exit 1
python -m fullycnnspeechenhancement_tpu.data.prepare.voicebank \
  --manifest-prefix='work/voicebank/data/manifest.voicebank' \
  --target-dir="${DATA_HOME:-$HOME/data}/SE/voicebank" \
  --sample-rate=8000
