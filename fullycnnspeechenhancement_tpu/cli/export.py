"""Export CLI: checkpoint -> npz weights and/or StableHLO artifact
(the reference's freeze.py surface, freeze.py:51-55)."""

from __future__ import annotations

import argparse

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache
from fullycnnspeechenhancement_tpu.config import load_ini_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Export a trained model")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--npz", default=None, help="output npz path")
    parser.add_argument("--stablehlo", default=None, help="output .shlo path")
    args = parser.parse_args(argv)
    if not (args.npz or args.stablehlo):
        parser.error("need at least one of --npz / --stablehlo")

    enable_compilation_cache()
    config = load_ini_config(args.cfg)

    from fullycnnspeechenhancement_tpu.export import export_npz, export_stablehlo
    from fullycnnspeechenhancement_tpu.infer import InferenceEngine

    engine = InferenceEngine(config, checkpoint=args.checkpoint)
    if args.npz:
        print(export_npz(args.npz, engine.params, engine.bn_state))
    if args.stablehlo:
        print(
            export_stablehlo(
                config, engine.params, engine.bn_state, args.stablehlo
            )
        )


if __name__ == "__main__":
    main()
