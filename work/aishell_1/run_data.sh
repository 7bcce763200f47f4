#!/usr/bin/env bash
cd "$(dirname "$0")/../.." || exit 1
python -m fullycnnspeechenhancement_tpu.data.prepare.aishell_1 \
  --manifest-prefix='work/aishell_1/data/manifest.aishell_1' \
  --target-dir="${DATA_HOME:-$HOME/data}/ASR/aishell_1" \
  --sample-rate=8000 || { echo "Prepare aishell_1 failed."; exit 1; }
python -m fullycnnspeechenhancement_tpu.data.prepare.noise \
  --manifest-prefix='work/noise/manifest.farfiled.background' \
  --target-dir="${DATA_HOME:-$HOME/data}/Noise/_Farfiled_background_" \
  --sample-rate=8000 || { echo "Prepare noise failed."; exit 1; }
echo "Manifest preparation done!"
