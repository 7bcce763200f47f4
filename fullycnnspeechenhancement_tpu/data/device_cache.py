"""Device-resident corpus cache + on-device SNR mixing.

The TPU-native answer to the input-pipeline bottleneck: at 8 kHz a
host-fed training loop must stream 32 kB of waveform per audio-second
(mix + clean, f32) across the host->device link, which caps throughput
at link bandwidth -- measured at ~45 MB/s through this environment's
remote tunnel, i.e. ~1,400 audio-s/s against a 6,400 audio-s/s device
step (benchmarks/PERF_NOTES.md round 3).  This module instead commits
the int16 PCM corpora to HBM ONCE and reconstructs every training batch
on device from ~1 kB of per-batch metadata:

    mix[b, n] = clean[chunk_c[b], off_c[b] + n] / 32768
              + scale[b] * noise[chunk_n[b], off_n[b] + n] / 32768

Addressing is CHUNKED: a corpus is stored as a 2-D int16 array
``[n_chunks, chunk_len]`` and every item carries an ``(chunk, offset)``
int32 pair.  JAX device integers are int32 unless the global x64 flag is
flipped, so a flat 1-D layout silently wraps at 2^31 samples (~74.5 h of
8 kHz audio) -- below aishell_1's 150 h train split, this module's
stated design point.  Chunk rows stay under ``chunk_limit`` samples
(default 2^30), so offsets are always int32-safe and capacity scales to
HBM size, not to an index-dtype ceiling.

HBM cost: 16 kB per corpus audio-second (int16) -- aishell_1's 150 h
train split is ~8.6 GB against v5e's 16 GB, and any noise corpus is
negligible.  `DeviceCorpus.nbytes()` reports the footprint before
committing.

Behavioural contract (asserted by tests/test_device_cache.py): batches
are identical to the host loader's (data/loader.py DataLoader) up to
one f32 rounding -- the host mixes ``speech + scale * noise`` through a
float64 scale promotion then casts, the device computes it in f32.
Specifically, it matches the host mixing (data/mixing.py, reference
`data_utils/data_loader.py:35-52`) for the random-crop branch (noise
recording >= utterance, the normal case for real noise corpora) and for
pre-mixed pair manifests; int16 PCM sources round-trip bit-exactly
(read_wav scales int16/32768; the cache stores the same int16).  The
tile-short-noise-with-random-gains branch is NOT representable as a
device slice -- build() raises for such pairs and the host DataLoader
remains the path for short-noise corpora.  The SNR scale is computed
host-side from the exact cached samples with the same f64 power
accumulation and the same seeded RNG draws as the host path.

The reference has no device-side data path at all (joblib decode into
feed_dict, `data_utils/data_loader.py:192-225`).
"""

from __future__ import annotations

import logging
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.config import DataConfig, DSPConfig
from fullycnnspeechenhancement_tpu.data.audio_io import read_wav
from fullycnnspeechenhancement_tpu.data.manifest import (
    ManifestEntry,
    read_manifest,
    shard_for_host,
)

logger = logging.getLogger(__name__)

# Per-chunk sample budget.  2^30 int16 samples = 2 GiB per chunk row and
# offsets that top out far below int32 range even after adding a bucket
# length.  Tests shrink this to exercise multi-chunk packing cheaply.
CHUNK_LIMIT_DEFAULT = 1 << 30


def _to_i16(wav: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> int16.  Bit-exact inverse of read_wav's int16
    scaling; resampled/float sources quantize at -96 dBFS (documented)."""
    return np.clip(
        np.round(np.asarray(wav, np.float64) * 32768.0), -32768, 32767
    ).astype(np.int16)


class FlatCorpus(NamedTuple):
    """One corpus as chunked int16 rows (each row zero-tail-padded).

    ``flat[chunks[i], offsets[i] : offsets[i] + lengths[i]]`` is entry i.
    Every row ends with >= ``pad`` zeros, so a device slice of up to
    ``lengths[i] + pad`` samples starting at any entry never clamps (and
    past-end samples are zero until the next entry begins mid-row; the
    consumer masks to the true length anyway).
    """

    flat: np.ndarray  # [n_chunks, chunk_len] int16
    chunks: np.ndarray  # [N] int32 row of each entry
    offsets: np.ndarray  # [N] int32 start within its row
    lengths: np.ndarray  # [N] int64 sample count of each entry
    pad: int  # guaranteed zero tail per row, in samples

    @classmethod
    def build(
        cls,
        paths: Sequence[str],
        sample_rate: int,
        pad_samples: int,
        chunk_limit: int = CHUNK_LIMIT_DEFAULT,
        num_workers: int = 1,
        use_native: bool = False,
    ) -> "FlatCorpus":
        pad = max(int(pad_samples), 1)
        if chunk_limit <= pad:
            raise ValueError(
                f"chunk_limit ({chunk_limit}) must exceed the tail pad "
                f"({pad})"
            )

        def decode(p: str) -> np.ndarray:
            if use_native:
                # GIL-free C++ decode+resample (runtime/fcse_runtime.cc):
                # worker threads actually scale, which matters for a one-
                # time pass over a 150 h corpus
                from fullycnnspeechenhancement_tpu.data import native

                wav, sr = native.decode_wav(p)
                if sr != sample_rate:
                    wav = native.resample(wav, sr, sample_rate)
            else:
                wav, _ = read_wav(p, sample_rate)
            return _to_i16(wav)

        if num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(num_workers) as pool:
                bufs = list(pool.map(decode, paths))
        else:
            bufs = [decode(p) for p in paths]
        for p, i16 in zip(paths, bufs):
            if len(i16) + pad > chunk_limit:
                raise ValueError(
                    f"single recording {p} ({len(i16)} samples) exceeds the "
                    f"chunk budget ({chunk_limit - pad}); raise chunk_limit"
                )
        # Greedy row packing under the chunk budget (entries never split).
        chunks = np.zeros(len(bufs), np.int32)
        offsets = np.zeros(len(bufs), np.int32)
        lengths = np.asarray([len(b) for b in bufs], np.int64)
        row, pos, fills = 0, 0, []
        for i, b in enumerate(bufs):
            if pos + len(b) + pad > chunk_limit:
                fills.append(pos)
                row, pos = row + 1, 0
            chunks[i], offsets[i] = row, pos
            pos += len(b)
        fills.append(pos)
        chunk_len = max(f + pad for f in fills)
        flat = np.zeros((len(fills), chunk_len), np.int16)
        for i, b in enumerate(bufs):
            flat[chunks[i], offsets[i] : offsets[i] + len(b)] = b
        return cls(flat, chunks, offsets, lengths, pad)

    def segment(self, i: int) -> np.ndarray:
        c, o, n = int(self.chunks[i]), int(self.offsets[i]), int(self.lengths[i])
        return self.flat[c, o : o + n]


class CachedBatch(NamedTuple):
    """Per-batch metadata (the ONLY steady-state host->device traffic).

    All index fields are int32 by design: chunked addressing keeps every
    offset < chunk_limit regardless of total corpus size, so the batch
    rides to device without x64 mode (see module docstring)."""

    clean_chunk: np.ndarray  # [B] int32 row into the clean flat
    clean_off: np.ndarray  # [B] int32 offset within that row
    other_chunk: np.ndarray  # [B] int32 row into noise flat (or mix flat)
    other_off: np.ndarray  # [B] int32 offset within that row
    scale: np.ndarray  # [B] float32 SNR noise scale (premixed: unused)
    lengths: np.ndarray  # [B] int32 true sample counts
    indices: np.ndarray  # [B] int32 dataset indices
    bucket_frames: int


class DeviceCorpus:
    """Clean (+ noise | + premixed-mix) corpora committed to the device.

    `clean`, `other` are jax device arrays after `.commit()`; before
    that they are host numpy (so CPU tests run without transfers).
    """

    def __init__(
        self,
        entries: List[ManifestEntry],
        noise_entries: Optional[List[ManifestEntry]],
        sample_rate: int,
        pad_samples: int,
        snr_db: float,
        seed: int,
        chunk_limit: int = CHUNK_LIMIT_DEFAULT,
        num_workers: int = 1,
        use_native: bool = False,
        shared_noise: Optional[FlatCorpus] = None,
    ):
        self.entries = entries
        self.sample_rate = sample_rate
        self.snr_db = snr_db
        self.seed = seed
        self.pad_samples = max(int(pad_samples), 1)
        self.premixed = bool(entries and entries[0].is_premixed)
        import functools

        build = functools.partial(
            FlatCorpus.build,
            sample_rate=sample_rate,
            pad_samples=self.pad_samples,
            chunk_limit=chunk_limit,
            num_workers=num_workers,
            use_native=use_native,
        )
        if self.premixed:
            self.clean_host = build(
                [e.clean_audio_filepath for e in entries]
            )
            self.other_host = build(
                [e.mix_audio_filepath for e in entries]
            )
            # premixed pairs truncate to the shorter of (clean, mix),
            # matching SpeechDataset.__getitem__
            self.item_lengths = np.minimum(
                self.clean_host.lengths, self.other_host.lengths
            )
            self.noise_host = None
        else:
            self.clean_host = build([e.audio_filepath for e in entries])
            self.item_lengths = self.clean_host.lengths.copy()
            if noise_entries:
                # `shared_noise` lets many corpora (rotating-cache
                # shards) reuse ONE decoded noise corpus instead of
                # re-decoding and re-holding it per shard
                self.noise_host = (
                    shared_noise
                    if shared_noise is not None
                    else build([e.audio_filepath for e in noise_entries])
                )
                short = self.noise_host.lengths.min()
                need = self.item_lengths.max()
                if short < need:
                    raise ValueError(
                        f"device_cache supports the random-crop mixing branch "
                        f"only: shortest noise recording ({short} samples) is "
                        f"shorter than the longest utterance ({need}).  Use "
                        f"the host DataLoader for short-noise corpora, or "
                        f"concatenate noise clips into longer tracks."
                    )
            else:
                self.noise_host = None
            self.other_host = self.noise_host
        self.clean = self.clean_host.flat
        # No-noise placeholder matches the clean rows' width so any slice
        # the loader can legally issue against clean also fits here (a
        # pad-only row crashed at trace time for utterances bucketed past
        # max_bucket_frames).
        self.other = (
            self.other_host.flat
            if self.other_host is not None
            else np.zeros((1, self.clean_host.flat.shape[1]), np.int16)
        )

        # Lazy SNR power caches (see _ensure_power_caches): per-item
        # speech power and noise cumulative-square tables make item_meta
        # O(1) instead of O(utterance samples) -- the per-epoch metadata
        # pass over a 150 h corpus would otherwise re-sum every sample.
        self._p_sig: Optional[np.ndarray] = None
        self._noise_cumsq: Optional[np.ndarray] = None

    def _ensure_power_caches(self) -> None:
        if self.premixed or self.noise_host is None:
            return
        if self._p_sig is None:
            n = len(self.item_lengths)
            p = np.zeros(n, np.float64)
            for i in range(n):
                seg = self.clean_host.segment(i).astype(np.float32) / 32768.0
                p[i] = np.dot(seg.astype(np.float64), seg.astype(np.float64))
            self._p_sig = p
        if self._noise_cumsq is not None:
            return  # injected (shared across rotating-cache shards)
        # Noise cumulative squares, ONE TABLE PER RECORDING: p_noise of a
        # crop [start, start+L) of noise ni is cum[ni][start+L] -
        # cum[ni][start] with entry-local indices.  Per-entry tables (a)
        # bound cumsum partials by one recording's power (a whole-row
        # cumsum near the 2^30-sample chunk budget would cancel a quiet
        # crop's power to percent-level error vs the host path's direct
        # sum) and (b) avoid the row-index collision of an in-row
        # restarted cumsum, where position o is simultaneously "end of
        # the previous recording" and "start of the next" -- that layout
        # made every start=0 crop of a non-first recording subtract the
        # previous recording's full power (wrong/negative scales,
        # silently un-noised batches).  f64 cost is 4x the int16 flat,
        # but only over the (small) noise corpus, never the speech corpus.
        nh = self.noise_host
        self._noise_cumsq = []
        for c, o, ln in zip(nh.chunks, nh.offsets, nh.lengths):
            seg = nh.flat[c, o : o + ln].astype(np.float32) / 32768.0
            self._noise_cumsq.append(
                np.concatenate(
                    [
                        np.zeros(1, np.float64),
                        np.cumsum(np.square(seg, dtype=np.float64)),
                    ]
                )
            )

    def nbytes(self) -> int:
        return self.clean.nbytes + (
            self.other.nbytes if self.other is not None else 0
        )

    def commit(self, sharding=None) -> "DeviceCorpus":
        """device_put the flats (one-time transfer); idempotent.

        `sharding` places the flats under an explicit jax sharding --
        pass a replicated NamedSharding (parallel.dp.replicate(mesh)) so
        the cached DP train step sees mesh-resident operands and XLA
        SPMD needs no resharding at step time."""
        if sharding is not None:
            self.clean = jax.device_put(jnp.asarray(self.clean), sharding)
            self.other = jax.device_put(jnp.asarray(self.other), sharding)
        else:
            self.clean = jax.device_put(jnp.asarray(self.clean))
            self.other = jax.device_put(jnp.asarray(self.other))
        return self

    # -- per-item metadata (host side, reference RNG semantics) ----------

    def noise_assignment(self, epoch: int) -> Optional[np.ndarray]:
        """Same per-epoch pairing draw as SpeechDataset.set_epoch."""
        if self.noise_host is None:
            return None
        rng = np.random.default_rng((self.seed, epoch))
        return rng.integers(
            0, len(self.noise_host.lengths), size=len(self.entries)
        )

    def item_meta(
        self, index: int, epoch: int, assignment: Optional[np.ndarray]
    ) -> Tuple[int, int, int, int, float]:
        """-> (clean_chunk, clean_off, other_chunk, other_off, scale) for
        one item, drawing the same seeded RNG sequence as
        SpeechDataset.__getitem__/mix_at_snr."""
        cc = int(self.clean_host.chunks[index])
        co = int(self.clean_host.offsets[index])
        L = int(self.item_lengths[index])
        if self.premixed:
            return (
                cc,
                co,
                int(self.other_host.chunks[index]),
                int(self.other_host.offsets[index]),
                0.0,
            )
        if self.noise_host is None:
            return cc, co, 0, 0, 0.0
        self._ensure_power_caches()
        ni = int(assignment[index])
        oc = int(self.noise_host.chunks[ni])
        no_base = int(self.noise_host.offsets[ni])
        n_len = int(self.noise_host.lengths[ni])
        rng = np.random.default_rng((self.seed, epoch, index))
        if n_len == L:
            start = 0  # mix_at_snr's >= branch with zero doublings: no draw
        else:
            start = int(rng.integers(0, n_len - L))
        p_sig = float(self._p_sig[index])
        s0 = no_base + start
        cum = self._noise_cumsq[ni]  # entry-local indices
        p_noise = float(cum[start + L] - cum[start])
        if p_noise <= 0.0:
            return cc, co, oc, s0, 0.0
        scale = np.sqrt(
            (p_sig / (10.0 ** (self.snr_db / 10.0))) / p_noise
        )
        return cc, co, oc, s0, float(scale)


def materialize_batch(
    clean_flat, other_flat, meta: CachedBatch, bucket_samples: int,
    premixed: bool
):
    """Device-side batch reconstruction: [B] metadata -> Batch waveforms.

    jit-traceable; `bucket_samples`/`premixed` must be static.  All
    reads are 2-D dynamic_slices into the resident int16 chunk rows (no
    gather); tails past each utterance's true length are zero-masked,
    matching the host collate's zero padding.  Callers must guarantee
    ``bucket_samples - length <= corpus.pad_samples`` per item
    (DeviceCacheLoader validates this at construction) so row-end slices
    never clamp."""
    n = jnp.arange(bucket_samples, dtype=jnp.int32)

    def one(cc, co, oc, oo, sc, ln):
        cl = (
            jax.lax.dynamic_slice(
                clean_flat, (cc, co), (1, bucket_samples)
            )[0].astype(jnp.float32)
            / 32768.0
        )
        ot = (
            jax.lax.dynamic_slice(
                other_flat, (oc, oo), (1, bucket_samples)
            )[0].astype(jnp.float32)
            / 32768.0
        )
        valid = n < ln
        cl = jnp.where(valid, cl, 0.0)
        ot = jnp.where(valid, ot, 0.0)
        mix = ot if premixed else cl + sc * ot
        return mix, cl

    mix, clean = jax.vmap(one)(
        meta.clean_chunk,
        meta.clean_off,
        meta.other_chunk,
        meta.other_off,
        meta.scale,
        meta.lengths,
    )
    return mix, clean


class DeviceCacheLoader:
    """Bucketed metadata loader over a DeviceCorpus.

    Duck-types the DataLoader surface the Trainer uses (set_epoch,
    __len__, __iter__) but yields CachedBatch metadata instead of
    waveforms.  Bucketing uses the EXACT decoded lengths (the host
    loader buckets on manifest durations); batches are static-size with
    the same repeat-tail padding as BucketSampler.
    """

    def __init__(
        self,
        corpus: DeviceCorpus,
        dsp: DSPConfig,
        batch_size: int,
        bucket_frames: Sequence[int] = (64, 128, 192, 256, 384, 512, 768, 1024),
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.corpus = corpus
        self.dsp = dsp
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.boundaries = sorted(bucket_frames)
        self._frames = [
            dsp.num_frames(int(n)) for n in corpus.item_lengths
        ]
        # Row-end overrun guard (ADVICE r3): a device slice reads
        # bucket_samples from the item's start; the corpus guarantees
        # only `pad_samples` of slack past each row's last entry, so any
        # item whose bucket padding exceeds that slack would clamp the
        # slice start and silently prepend the previous entry's audio.
        # Refuse loudly instead.
        worst = 0
        max_bs = 0
        for f, ln in zip(self._frames, corpus.item_lengths):
            bs = dsp.padded_samples(self.bucket_for(f))
            worst = max(worst, bs - int(ln))
            max_bs = max(max_bs, bs)
        if worst > corpus.pad_samples:
            raise ValueError(
                f"corpus tail pad ({corpus.pad_samples} samples) is smaller "
                f"than the worst-case bucket slack ({worst}); rebuild the "
                f"corpus with max_bucket_frames >= "
                f"{max(self.bucket_for(f) for f in self._frames)} "
                f"(build_device_corpus sizes the pad from it)"
            )
        for name, arr in (("clean", corpus.clean), ("other", corpus.other)):
            if self._frames and max_bs > arr.shape[1]:
                raise ValueError(
                    f"largest bucket slice ({max_bs} samples) exceeds the "
                    f"{name} corpus chunk width ({arr.shape[1]}); rebuild "
                    f"with max_bucket_frames >= "
                    f"{max(self.bucket_for(f) for f in self._frames)}"
                )
        self._epoch = 0

    def bucket_for(self, frames: int) -> int:
        for b in self.boundaries:
            if frames <= b:
                return b
        top = self.boundaries[-1]
        return ((frames + top - 1) // top) * top

    # -- common cached-loader surface (shared with the rotating loader) --

    @property
    def premixed(self) -> bool:
        return self.corpus.premixed

    def activate(self, sharding=None) -> None:
        """Commit the corpus flats to device (idempotent)."""
        self.corpus.commit(sharding)

    def flats(self):
        """(clean_flat, other_flat) backing the CURRENT batches."""
        return self.corpus.clean, self.corpus.other

    @property
    def generation(self) -> int:
        """Monotonic id of the flats backing the current batches; the
        plain loader commits once, so it never changes.  The Trainer's
        feeder keys scan groups / flush decisions on this (keying on the
        flats' Python object identity would be vulnerable to CPython id
        reuse after GC -- ADVICE r4)."""
        return 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _plan(self, epoch: int):
        rng = np.random.default_rng((self.seed, epoch))
        order = np.arange(len(self._frames))
        if self.shuffle:
            rng.shuffle(order)
        by_bucket: dict = {}
        for i in order:
            by_bucket.setdefault(
                self.bucket_for(self._frames[i]), []
            ).append(int(i))
        out = []
        for bucket, idxs in sorted(by_bucket.items()):
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start : start + self.batch_size]
                while len(chunk) < self.batch_size:
                    chunk = chunk + chunk[: self.batch_size - len(chunk)]
                out.append((bucket, chunk))
        if self.shuffle:
            rng.shuffle(out)
        return out

    def __len__(self) -> int:
        return len(self._plan(0))

    def pad_len(self, bucket_frames: int) -> int:
        return self.dsp.padded_samples(bucket_frames)

    def __iter__(self):
        assignment = self.corpus.noise_assignment(self._epoch)
        for bucket, idxs in self._plan(self._epoch):
            B = len(idxs)
            ccs = np.zeros(B, np.int32)
            cos = np.zeros(B, np.int32)
            ocs = np.zeros(B, np.int32)
            oos = np.zeros(B, np.int32)
            sc = np.zeros(B, np.float32)
            ln = np.zeros(B, np.int32)
            for j, i in enumerate(idxs):
                cc, co, oc, oo, s = self.corpus.item_meta(
                    i, self._epoch, assignment
                )
                ccs[j], cos[j], ocs[j], oos[j], sc[j] = cc, co, oc, oo, s
                ln[j] = int(self.corpus.item_lengths[i])
            yield CachedBatch(
                ccs, cos, ocs, oos, sc, ln, np.asarray(idxs, np.int32), bucket
            )


def build_device_corpus(
    manifest_path: str,
    noise_manifest: Optional[str],
    dsp: DSPConfig,
    data: Optional[DataConfig] = None,
    host_index: int = 0,
    host_count: int = 1,
    max_bucket_frames: int = 1024,
    commit: bool = True,
    sharding=None,
    chunk_limit: int = CHUNK_LIMIT_DEFAULT,
    entries: Optional[List[ManifestEntry]] = None,
) -> DeviceCorpus:
    """Read manifests (host-sharded), build + (optionally) commit flats.

    `entries` skips the manifest read when the caller already parsed it
    (it must be UNsharded and duration-filtered; host sharding happens
    here)."""
    min_d = data.min_duration if data else 0.4
    max_d = data.max_duration if data else float("inf")
    snr = data.snr if data else 0.0
    seed = data.seed if data else 0
    if entries is None:
        entries = read_manifest(manifest_path, min_d, max_d)
    entries = shard_for_host(entries, host_index, host_count)
    noise_entries = (
        read_manifest(noise_manifest) if noise_manifest else None
    )
    corpus = DeviceCorpus(
        entries,
        noise_entries,
        dsp.sample_rate,
        pad_samples=dsp.padded_samples(max_bucket_frames),
        snr_db=snr,
        seed=seed,
        chunk_limit=chunk_limit,
        num_workers=(data.num_workers if data else 1),
        use_native=(data.use_native if data else False),
    )
    return corpus.commit(sharding) if commit else corpus


class RotatingDeviceCacheLoader:
    """Epoch-partitioned device cache for corpora LARGER than HBM.

    The (host-sharded) manifest splits into shards whose int16 flats fit
    `hbm_budget_bytes`; every shard is decoded ONCE up front (optionally
    spilled to disk as numpy memmaps so host RAM holds at most one shard)
    and rotated through HBM during the epoch: commit shard, train its
    batches, release, next.  Every shard commits at ONE common flat shape
    (zero-padded into a fresh per-commit buffer -- never a shared one,
    whose reuse would race the async H2D copy), so each (bucket, K)
    train step compiles once and is reused across shards and epochs.

    Contract: each shard behaves exactly like a `DeviceCacheLoader` over
    its sub-manifest (same bucketing / static batching / on-device mixing
    semantics; RNG streams are seeded per shard).  An epoch visits every
    item exactly once (plus per-shard static-batch tail repeats), with
    shard order reshuffled per epoch.  Steady-state H2D = per-batch
    metadata plus ONE flats transfer per shard per epoch -- i.e. 16 kB
    per audio-second once per epoch, vs the host-fed loader's 32 kB per
    audio-second EVERY step.

    Sizing: keep `hbm_budget_bytes` at <= ~40% of free HBM -- during a
    rotation the previous shard's flats stay referenced by up-to-
    queue-depth in-flight batches while the next shard commits, so two
    shards are briefly resident.

    The reference has no counterpart at any scale (single-GPU feed_dict,
    `/root/reference/model_utils/trainer.py:181-192`); this is the
    device-cache design extended past HBM capacity (aishell_2's ~1000 h
    train split is ~60 GB int16 against 16 GB of v5e HBM).
    """

    def __init__(
        self,
        manifest_path: str,
        noise_manifest: Optional[str],
        dsp: DSPConfig,
        batch_size: int,
        data: Optional[DataConfig] = None,
        hbm_budget_bytes: int = 6 << 30,
        host_index: int = 0,
        host_count: int = 1,
        bucket_frames: Sequence[int] = (64, 128, 192, 256, 384, 512, 768, 1024),
        shuffle: bool = True,
        seed: Optional[int] = None,
        spill_dir: Optional[str] = None,
        max_bucket_frames: Optional[int] = None,
        chunk_limit: int = CHUNK_LIMIT_DEFAULT,
        entries: Optional[List[ManifestEntry]] = None,
    ):
        min_d = data.min_duration if data else 0.4
        max_d = data.max_duration if data else float("inf")
        self.snr = data.snr if data else 0.0
        # an explicit seed always wins; None defers to data.seed
        self.seed = (
            seed
            if seed is not None
            else (data.seed if data is not None else 0)
        )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.dsp = dsp
        if entries is None:
            entries = read_manifest(manifest_path, min_d, max_d)
        entries = shard_for_host(entries, host_index, host_count)
        if not entries:
            raise ValueError(f"empty manifest {manifest_path}")
        noise_entries = (
            read_manifest(noise_manifest) if noise_manifest else None
        )
        mbf = max_bucket_frames or max(bucket_frames)
        pad = dsp.padded_samples(mbf)

        # Greedy split by estimated int16 bytes (manifest durations; the
        # exact decoded lengths differ by at most resampling rounding,
        # covered by the 5% slack).
        budget = int(hbm_budget_bytes * 0.95)
        shards: List[List[ManifestEntry]] = [[]]
        acc = 0
        total_bytes = 0
        for e in entries:
            nbytes = int(e.duration * dsp.sample_rate) * 2 * (
                2 if e.is_premixed else 1
            )
            if shards[-1] and acc + nbytes > budget:
                shards.append([])
                acc = 0
            shards[-1].append(e)
            acc += nbytes
            total_bytes += nbytes
        if spill_dir is None and total_bytes > _host_ram_soft_limit():
            # Without spill_dir every decoded shard stays resident in
            # host RAM simultaneously (the design target is ~60 GB for
            # aishell_2) -- warn before the decode pass OOMs the host
            # (ADVICE r4).
            logger.warning(
                "RotatingDeviceCacheLoader will hold ~%.1f GB of decoded "
                "corpus in host RAM (no spill_dir set); pass spill_dir= "
                "to keep at most one shard resident via disk memmaps",
                total_bytes / 2**30,
            )

        num_workers = data.num_workers if data else 1
        use_native = data.use_native if data else False
        # decode the noise corpus ONCE; every shard shares the flat and
        # (below) the f64 cumulative-square tables
        shared_noise = (
            FlatCorpus.build(
                [e.audio_filepath for e in noise_entries],
                dsp.sample_rate,
                pad,
                chunk_limit=chunk_limit,
                num_workers=num_workers,
                use_native=use_native,
            )
            if noise_entries
            else None
        )
        if shared_noise is not None and spill_dir is not None:
            os.makedirs(spill_dir, exist_ok=True)
            shared_noise = shared_noise._replace(
                flat=_spill(
                    shared_noise.flat, os.path.join(spill_dir, "noise.npy")
                )
            )
        self._corpora: List[DeviceCorpus] = []
        self._loaders: List[DeviceCacheLoader] = []
        for si, shard_entries in enumerate(shards):
            corpus = DeviceCorpus(
                shard_entries,
                noise_entries,
                dsp.sample_rate,
                pad_samples=pad,
                snr_db=self.snr,
                # distinct per-shard RNG streams (pairing + crop draws)
                seed=(self.seed * 1_000_003 + si) & 0x7FFFFFFF,
                chunk_limit=chunk_limit,
                num_workers=num_workers,
                use_native=use_native,
                shared_noise=shared_noise,
            )
            if spill_dir is not None:
                os.makedirs(spill_dir, exist_ok=True)
                # rebind BOTH the device-commit views and the host-side
                # FlatCorpus so the RAM copies actually become
                # collectable (clean_host.flat is read later by
                # item_meta/_ensure_power_caches).  The shared noise flat
                # was spilled once above; only shard-specific flats spill
                # here (clean always, `other` only for premixed mixes).
                corpus.clean = _spill(
                    corpus.clean, os.path.join(spill_dir, f"clean_{si}.npy")
                )
                corpus.clean_host = corpus.clean_host._replace(
                    flat=corpus.clean
                )
                if corpus.premixed:
                    corpus.other = _spill(
                        corpus.other,
                        os.path.join(spill_dir, f"other_{si}.npy"),
                    )
                    corpus.other_host = corpus.other_host._replace(
                        flat=corpus.other
                    )
            self._corpora.append(corpus)
            self._loaders.append(
                DeviceCacheLoader(
                    corpus,
                    dsp,
                    batch_size,
                    bucket_frames=bucket_frames,
                    shuffle=shuffle,
                    seed=(self.seed * 1_000_003 + si) & 0x7FFFFFFF,
                )
            )
        self.premixed = self._corpora[0].premixed
        if any(c.premixed != self.premixed for c in self._corpora):
            raise ValueError("mixed premixed/non-premixed shards")
        if shared_noise is not None and len(self._corpora) > 1:
            # the f64 cumsq tables depend only on the (shared) noise
            # flat; compute once, inject everywhere
            self._corpora[0]._ensure_power_caches()
            for c in self._corpora[1:]:
                c._noise_cumsq = self._corpora[0]._noise_cumsq

        # One common commit shape per flat kind: shards zero-pad into it
        # at commit time so the jitted steps see ONE shape.
        self._clean_shape = (
            max(c.clean.shape[0] for c in self._corpora),
            max(c.clean.shape[1] for c in self._corpora),
        )
        self._other_shape = (
            max(c.other.shape[0] for c in self._corpora),
            max(c.other.shape[1] for c in self._corpora),
        )
        # Non-premixed shards with a shared noise corpus all reference ONE
        # host `other` flat; commit its device copy once and reuse it
        # across rotations instead of re-uploading per shard (ADVICE r4).
        self._shared_other = all(
            c.other is self._corpora[0].other for c in self._corpora
        )
        self._other_device = None
        self._sharding = None
        self._resident: Optional[int] = None
        self._flats = None
        self._generation = 0
        self._epoch = 0

    # -- common cached-loader surface ------------------------------------

    def activate(self, sharding=None) -> None:
        """Record the device placement; flats commit lazily per rotation."""
        self._sharding = sharding

    def flats(self):
        if self._flats is None:
            raise RuntimeError(
                "no shard resident; iterate the loader (flats are "
                "committed per rotation)"
            )
        return self._flats

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        return sum(len(ld) for ld in self._loaders)

    def pad_len(self, bucket_frames: int) -> int:
        return self.dsp.padded_samples(bucket_frames)

    @property
    def num_shards(self) -> int:
        return len(self._corpora)

    def nbytes_resident(self) -> int:
        return (
            int(np.prod(self._clean_shape)) + int(np.prod(self._other_shape))
        ) * 2

    @property
    def generation(self) -> int:
        """Monotonic counter bumped on every shard commit: two batches
        share a generation iff their metadata indexes the SAME resident
        flats.  The Trainer feeder keys scan grouping and the
        shard-boundary flush on this (object identity of the flats tuple
        is unsafe: CPython reuses ids after GC -- ADVICE r4)."""
        return self._generation

    # -- rotation ---------------------------------------------------------

    def _commit_shard(self, si: int) -> None:
        if self._resident == si:
            return
        c = self._corpora[si]

        def staged(src, shape):
            if src.shape == shape:
                # shard host flats are immutable; transfer straight from
                # them (memmap-backed when spilled)
                buf = np.asarray(src)
            else:
                # FRESH zero-padded buffer per commit.  An earlier design
                # reused one shared staging buffer across rotations; the
                # H2D copy is asynchronous under concurrent step dispatch,
                # so mutating the buffer for the NEXT shard raced the
                # in-flight transfer of the previous one -- observed as
                # timing-dependent corrupt batches (nondeterministic loss
                # trajectories) on a CPU mesh, and silently possible on
                # any async backend.  calloc'd pages make the zero fill
                # effectively free; the buffer is dropped after the
                # transfer (JAX holds its own reference until the copy
                # completes).
                buf = np.zeros(shape, np.int16)
                buf[: src.shape[0], : src.shape[1]] = src
            if self._sharding is not None:
                return jax.device_put(buf, self._sharding)
            return jax.device_put(buf)

        # Drop our references to the previous shard's device flats FIRST:
        # in-flight prepped batches keep it alive until dispatched, after
        # which HBM frees -- see the sizing note in the class docstring.
        # (The shared noise flat is intentionally kept resident across
        # rotations: identical for every shard, uploading it once saves
        # its H2D cost per rotation.)
        self._flats = None
        self._resident = None
        if self._shared_other:
            if self._other_device is None:
                self._other_device = staged(c.other, self._other_shape)
            other = self._other_device
        else:
            other = staged(c.other, self._other_shape)
        self._flats = (staged(c.clean, self._clean_shape), other)
        self._resident = si
        self._generation += 1

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self._epoch, 7919))
        order = np.arange(self.num_shards)
        if self.shuffle:
            rng.shuffle(order)
        for si in order:
            self._commit_shard(int(si))
            sub = self._loaders[int(si)]
            sub.set_epoch(self._epoch)
            yield from sub


def _host_ram_soft_limit() -> int:
    """Half the host's physical RAM (fallback 16 GB where unreadable):
    the threshold above which holding a whole un-spilled corpus in host
    memory gets a loud warning."""
    try:
        return (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) // 2
    except (ValueError, OSError, AttributeError):
        return 16 << 30


def _spill(arr: np.ndarray, path: str) -> np.ndarray:
    """Write `arr` to a disk-backed numpy memmap and return the memmap
    (the RAM copy becomes collectable): host RAM then holds at most one
    commit buffer + one shard page cache, not the whole corpus."""
    mm = np.lib.format.open_memmap(
        path, mode="w+", dtype=arr.dtype, shape=arr.shape
    )
    mm[...] = arr
    mm.flush()
    return mm
