"""Worker process for the true multi-process multi-host DP test.

Spawned (2x) by tests/test_multihost.py: each process owns ONE CPU device,
joins a jax.distributed pod via the localhost coordinator, reads its own
per-host manifest shard (`shard_for_host`), assembles the global batch
with `jax.make_array_from_process_local_data`, and runs one DP train step
over the global ('data',) mesh.  Process 0 writes the resulting loss and a
parameter slice for the parent test to compare against a single-process
2-device run of the identical global batch.

This is the execution path a real TPU pod uses (one process per host,
XLA-inserted gradient all-reduce); the reference has no multi-anything
(SURVEY.md SS2.3).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--coord", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--steps",
        type=int,
        default=1,
        help="steps_per_call: >1 runs the stacked multi-step DP path "
        "(make_parallel_multi_step) instead of the single-step path",
    )
    p.add_argument(
        "--cached",
        action="store_true",
        help="run the device-cache DP path: every process builds the full "
        "corpus, flats ride as replicated global arrays, [B] metadata "
        "shards over 'data' (make_parallel_cached_step)",
    )
    a = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    from fullycnnspeechenhancement_tpu.parallel.multihost import (
        host_count,
        host_index,
        initialize_multihost,
        local_batch_size,
    )

    initialize_multihost(a.coord, a.nprocs, a.pid)
    assert jax.process_count() == a.nprocs, jax.process_count()
    assert jax.device_count() == a.nprocs
    assert jax.local_device_count() == 1

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fullycnnspeechenhancement_tpu.config import Config, TrainConfig
    from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset
    from fullycnnspeechenhancement_tpu.data.loader import DataLoader
    from fullycnnspeechenhancement_tpu.models import get_model
    from fullycnnspeechenhancement_tpu.parallel import make_mesh
    from fullycnnspeechenhancement_tpu.parallel.dp import (
        make_parallel_multi_step,
        make_parallel_train_step,
        stacked_batch_sharding,
    )
    from fullycnnspeechenhancement_tpu.train import create_train_state
    from fullycnnspeechenhancement_tpu.train.step import Batch

    global_batch = 4
    config = Config(
        train=TrainConfig(batch_size=global_batch, lr=1e-3, warmup_steps=100)
    )
    # Per-host input sharding: this host reads every k-th manifest entry.
    ds = SpeechDataset(
        a.manifest,
        None,
        config.dsp.sample_rate,
        host_index=host_index(),
        host_count=host_count(),
    )
    loader = DataLoader(
        ds,
        config.dsp,
        local_batch_size(global_batch),
        shuffle=False,
        num_workers=1,
    )
    b = next(iter(loader))

    mesh = make_mesh(n_data=jax.device_count())
    sh = NamedSharding(mesh, P("data"))

    def globalize(local):
        return jax.make_array_from_process_local_data(sh, np.asarray(local))

    model = get_model("FullyCNNV2")
    state = create_train_state(config, model, jax.random.PRNGKey(42))
    if a.cached:
        # Device-cache DP across REAL process boundaries: identical
        # corpora built per process (full manifest, not the host shard),
        # flats as fully-replicated global arrays, metadata rows owned
        # per host.
        from fullycnnspeechenhancement_tpu.data.device_cache import (
            DeviceCacheLoader,
            build_device_corpus,
        )
        from fullycnnspeechenhancement_tpu.parallel.dp import (
            make_parallel_cached_step,
        )
        from fullycnnspeechenhancement_tpu.train.cached_step import Meta

        corpus = build_device_corpus(
            a.manifest, None, config.dsp, commit=False
        )
        repl = NamedSharding(mesh, P())
        clean_flat = jax.make_array_from_process_local_data(
            repl, np.asarray(corpus.clean)
        )
        other_flat = jax.make_array_from_process_local_data(
            repl, np.asarray(corpus.other)
        )
        cloader = DeviceCacheLoader(
            corpus, config.dsp, global_batch, shuffle=False
        )
        cb = next(iter(cloader))
        lo = a.pid * local_batch_size(global_batch)
        hi = lo + local_batch_size(global_batch)
        fields = (
            cb.clean_chunk,
            cb.clean_off,
            cb.other_chunk,
            cb.other_off,
            cb.scale,
            cb.lengths,
        )
        meta = Meta(
            *(
                jax.make_array_from_process_local_data(
                    sh, np.ascontiguousarray(x[lo:hi])
                )
                for x in fields
            )
        )
        pstep = make_parallel_cached_step(
            config,
            model,
            mesh,
            config.dsp.padded_samples(cb.bucket_frames),
            corpus.premixed,
            batch_size=global_batch,  # guard the ACTUAL [B] (ADVICE r4)
        )
        state, metrics = pstep(state, clean_flat, other_flat, meta)
        losses = np.asarray([float(metrics["loss"])])
    elif a.steps == 1:
        batch = Batch(
            globalize(b.mix_wav), globalize(b.clean_wav), globalize(b.lengths)
        )
        pstep = make_parallel_train_step(config, model, mesh)
        state, metrics = pstep(state, batch)
        losses = np.asarray([float(metrics["loss"])])
    else:
        # Stacked [K, B_local, ...] batch: step k's batch is the loader
        # batch scaled by a deterministic per-step gain, so the parent's
        # single-process stacked run can rebuild the identical sequence.
        ssh = stacked_batch_sharding(mesh)

        def globalize_stacked(local):
            return jax.make_array_from_process_local_data(
                ssh, np.asarray(local)
            )

        gains = [1.0 - 0.2 * k for k in range(a.steps)]
        batch = Batch(
            globalize_stacked(
                np.stack([g * np.asarray(b.mix_wav) for g in gains])
            ),
            globalize_stacked(
                np.stack([g * np.asarray(b.clean_wav) for g in gains])
            ),
            globalize_stacked(
                np.stack([np.asarray(b.lengths)] * a.steps)
            ),
        )
        pstep = make_parallel_multi_step(config, model, mesh)
        state, packed = pstep(state, batch)
        losses = np.asarray(jax.device_get(packed))[:, 0]
    loss = float(losses[-1])
    w = np.asarray(jax.device_get(state.params["encode_1"]["w"]))
    bn_mean = np.asarray(jax.device_get(state.bn_state["encode_1"]["mean"]))
    np.savez(
        f"{a.out}.proc{a.pid}", loss=loss, losses=losses, w=w,
        bn_mean=bn_mean, n_local_items=len(ds), step=int(state.step),
    )
    print(f"proc {a.pid}: losses={losses}", flush=True)


if __name__ == "__main__":
    main()
