"""Inference CLI: denoise one wav file (reference infer.py:80-89)."""

from __future__ import annotations

import argparse

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache
from fullycnnspeechenhancement_tpu.config import load_ini_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Denoise a wav file")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--audio-file", required=True)
    parser.add_argument("--checkpoint", default=None)
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = load_ini_config(args.cfg)

    from fullycnnspeechenhancement_tpu.infer import InferenceEngine

    engine = InferenceEngine(config, checkpoint=args.checkpoint)
    out = engine.denoise(args.audio_file)
    print(out)


if __name__ == "__main__":
    main()
