"""Command-line entry points mirroring the reference's train/test/infer/
freeze scripts, driven by the same INI config files."""

from __future__ import annotations

import logging
import os
import time


def setup_file_logger(log_dir: str, tag: str) -> logging.Logger:
    """Timestamped per-run log file (reference train.py:34-44)."""
    os.makedirs(log_dir, exist_ok=True)
    name = time.asctime().replace(":", "-").replace(" ", "_")
    logger = logging.getLogger(tag)
    logger.setLevel(logging.INFO)
    handler = logging.FileHandler(
        os.path.join(log_dir, f"{tag}_{name}_log.txt"), mode="w"
    )
    handler.setFormatter(
        logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(handler)
    logger.addHandler(logging.StreamHandler())
    return logger


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: compiles through the remote TPU
    tunnel run ~2 min per unique shape, so caching across processes
    matters."""
    import jax

    cache_dir = path or os.environ.get(
        "FCSE_JAX_CACHE", os.path.expanduser("~/.cache/fcse_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
