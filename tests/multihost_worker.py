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
        make_parallel_train_step,
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

    batch = Batch(
        globalize(b.mix_wav), globalize(b.clean_wav), globalize(b.lengths)
    )
    model = get_model("FullyCNNV2")
    state = create_train_state(config, model, jax.random.PRNGKey(42))
    pstep = make_parallel_train_step(config, model, mesh)
    state, metrics = pstep(state, batch)
    loss = float(metrics["loss"])
    w = np.asarray(jax.device_get(state.params["encode_1"]["w"]))
    bn_mean = np.asarray(jax.device_get(state.bn_state["encode_1"]["mean"]))
    np.savez(
        f"{a.out}.proc{a.pid}", loss=loss, w=w, bn_mean=bn_mean,
        n_local_items=len(ds),
    )
    print(f"proc {a.pid}: loss={loss}", flush=True)


if __name__ == "__main__":
    main()
