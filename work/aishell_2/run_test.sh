#!/usr/bin/env bash
cd "$(dirname "$0")/../.." || exit 1
python -u -m fullycnnspeechenhancement_tpu.cli.test \
  --cfg work/aishell_2/cfg/fully_cnn_test.cfg --num-works 8
