#!/usr/bin/env bash
cd "$(dirname "$0")/../.." || exit 1
python -u -m fullycnnspeechenhancement_tpu.cli.train \
  --cfg work/aishell_1/cfg/fully_cnn_train.cfg --num-works 8
