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
    parser.add_argument(
        "--time-shard",
        type=int,
        default=0,
        metavar="N",
        help="shard over-top-bucket utterances' time axis across N "
        "devices with halo exchange (parallel/halo.py); needs >= N "
        "attached devices -- long recordings then split across the mesh "
        "instead of padding up on one chip",
    )
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = load_ini_config(args.cfg)

    from fullycnnspeechenhancement_tpu.infer import InferenceEngine

    mesh = None
    if args.time_shard > 1:
        from fullycnnspeechenhancement_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.time_shard)
    engine = InferenceEngine(config, checkpoint=args.checkpoint, mesh=mesh)
    out = engine.denoise(args.audio_file)
    print(out)


if __name__ == "__main__":
    main()
