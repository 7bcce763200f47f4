"""Typed configuration with an INI-compatible front-end.

The reference drives everything from `configparser` INI files
(`/root/reference/config.py:9-12`, canonical keys in
`/root/reference/Work/aishell_1/cfg/fully_cnn_train.cfg`).  This module keeps
that surface (``load_ini_config`` accepts the same files, same sections, same
key names) but normalises it into typed dataclasses so the rest of the
framework never touches raw string lookups.

Known reference quirks handled here (SURVEY.md Appendix A.1/A.2):
  * ``[data] windows`` and ``[data] nfft`` are parsed by no reference code
    path -- analysis nfft is hardcoded to 256 and the window is always
    Hamming.  We honour the keys, but default to the *behavioural* values
    (hamming / 256) and warn when an INI file asks for something the
    reference would silently ignore.
"""

from __future__ import annotations

import configparser
import dataclasses
import logging
from typing import Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DSPConfig:
    """Analysis/synthesis chain parameters (SURVEY.md Appendix B)."""

    sample_rate: int = 8000
    window_ms: float = 32.0
    stride_ms: float = 16.0
    # Analysis rFFT size.  The reference hardcodes 256
    # (data_utils/data_loader.py:59) regardless of the cfg `nfft` key.
    analysis_nfft: int = 256
    # Synthesis irFFT size.  The reference's AudioReBuild defaults to 512 and
    # is always constructed with no args (model_utils/utils.py:94,
    # trainer.py:253) -- i.e. a 512-point irfft over 129-bin spectra, cropped
    # to the first frame_length samples.  Not a faithful inverse; kept as the
    # parity path.
    synthesis_nfft: int = 512
    window_name: str = "hamming"
    preemphasis: float = 0.97

    @property
    def frame_length(self) -> int:
        return int(round(self.window_ms / 1000.0 * self.sample_rate))

    @property
    def frame_step(self) -> int:
        return int(round(self.stride_ms / 1000.0 * self.sample_rate))

    @property
    def num_bins(self) -> int:
        return self.analysis_nfft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """Frame count for an utterance, matching the reference's formula
        ``ceil(|L - frame_length| / frame_step + 1)``
        (data_utils/audio_feature.py:70)."""
        import math

        return int(
            math.ceil(abs(num_samples - self.frame_length) / self.frame_step + 1)
        )

    def padded_samples(self, num_frames: int) -> int:
        """Samples needed so that `num_frames` frames can be gathered.

        The reference pads to ``num_frames * step + frame_length``
        (audio_feature.py:71); we only need
        ``(num_frames - 1) * step + frame_length`` but keep headroom cheap.
        """
        return (num_frames - 1) * self.frame_step + self.frame_length


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # "RCED" in the reference ([model] net_arch); kept for config parity.
    net_arch: str = "RCED"
    # FullyCNN | FullyCNNV2 | FullyCNNV3 (reference [model] net_work).
    net_work: str = "FullyCNNV2"
    feature_dim: int = 129
    # Compute dtype for conv stacks.  float32 matches the reference; bfloat16
    # is the TPU-native fast path (params stay f32, activations bf16).
    compute_dtype: str = "float32"
    # Serve inference through the fused Pallas whole-stack kernel
    # (ops/pallas_rced.py): one HBM read + one write for the inner conv
    # stack instead of a round trip per layer.  Numerics: MXU-default f32
    # (~2e-3 relative vs the HIGHEST-precision XLA path), so parity tests
    # keep this off.  Throughput break-even vs the XLA blocked path is
    # ~32k frames per call (batch 64 x 8 s -- BENCH_r04); below that the
    # kernel reaches ~0.8x XLA and logs a warning, and its value is f32
    # accuracy at bf16-comparable speed rather than throughput.
    fused_inference: bool = False
    # Run the conv stack through the freq-to-depth "blocked" forward
    # (models/blocked.py): an exact reparametrization that folds
    # `blocked_fb` (default 8) frequency bins into channels, turning
    # the (1,k) freq convs into
    # dense MXU shapes -- measured ~2x faster fwd+bwd on v5e.  Same math,
    # same params/checkpoints; only f32 reduction order differs (verified
    # exact in f64, tests/test_blocked.py).  Default off so the parity
    # defaults stay bitwise-comparable; the TPU fast path (bench, work
    # cfgs) turns it on alongside bfloat16.
    blocked_compute: bool = False
    # Frequency bins folded per block (see models/blocked.py FB_DEFAULT's
    # measured sweep; 8 is the v5e sweet spot).
    blocked_fb: int = 8
    # Route the blocked inner freq-convs through a custom VJP whose dW is
    # the single-HBM-pass Pallas kernel (ops/pallas_dw.py).  MEASURED
    # SLOWER than XLA's own conv autodiff on v5e (131.8 vs 79.4 ms for
    # the batch-64 bf16 V2 step: splitting the backward out of XLA's
    # fused grad costs more than the kernel's one-pass dW saves --
    # benchmarks/PERF_NOTES.md round 3), so the default is False = plain
    # conv + XLA autodiff.  Kept as an option for kernel study; only
    # consulted when blocked_compute.
    dw_pallas: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 5
    batch_size: int = 2
    lr: float = 1.5e-3
    warmup_steps: int = 10000
    continue_train: bool = True
    checkpoints_path: str = "checkpoints"
    base_checkpoint_file: str = ""
    num_iter_print: int = 100
    log_dir: str = "checkpoints/log"
    seed: int = 0
    # Loss over zero-padded frames, divided by *configured* batch size --
    # faithful to trainer.py:143-147 / Appendix A.12-13.  Set mask_loss=True
    # for the corrected masked-loss mode (documented departure).
    mask_loss: bool = False
    # Validation cadence: reference validates every 5 epochs
    # (trainer.py:242-243).
    valid_every_epochs: int = 5
    max_checkpoints_to_keep: int = 10
    # Number of data-parallel devices to shard the batch over (1 = single
    # chip; the mesh is ('data', 'model') with 'model' unused for this
    # 32k-param family).
    data_parallel: int = 1
    # Optimizer steps chained on device per host dispatch (lax.scan).  >1
    # amortizes host dispatch / tunnel latency over K steps: the loader's
    # batches are grouped per bucket and stacked to [K, B, L].  1 keeps the
    # one-dispatch-per-batch loop.
    steps_per_call: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_manifest_path: str = ""
    val_manifest_path: str = ""
    test_manifest_path: str = ""
    train_noise_manifest: Optional[str] = None
    val_noise_manifest: Optional[str] = None
    test_noise_manifest: Optional[str] = None
    snr: float = 0.0
    min_duration: float = 0.4
    max_duration: float = float("inf")
    audio_save_path: str = "denoise"
    num_workers: int = 4
    prefetch_batches: int = 4
    # Decode/resample/mix items through the C++ runtime
    # (runtime/fcse_runtime.cc via ctypes) -- GIL-free, so loader worker
    # threads scale.  Requires libfcse_runtime.so (make -C
    # fullycnnspeechenhancement_tpu/runtime).  Mixing randomness uses the
    # C++ mt19937_64 stream: same semantics, different draws than the
    # Python path.
    use_native: bool = False
    # Static-shape length bucketing (frames per bucket boundary).  XLA needs
    # static shapes; utterances are padded up to the bucket edge and the pad
    # is masked/ignored per `TrainConfig.mask_loss`.
    bucket_frames: tuple = (64, 128, 192, 256, 384, 512, 768, 1024)
    seed: int = 0
    # Commit the training corpora to device HBM as int16 flats and mix
    # batches ON DEVICE (data/device_cache.py): steady-state host->device
    # traffic drops from [B, L] waveforms to [B] metadata, removing the
    # host-link ceiling on training throughput.  Requires the corpus to
    # fit HBM (~16 kB per audio-second) and the random-crop mixing branch
    # (noise recordings >= utterances); falls back loudly otherwise.
    use_device_cache: bool = False
    # HBM budget (GiB) for the device cache.  0 = whole corpus resident
    # (plain DeviceCacheLoader).  >0 and the corpus estimate exceeds it:
    # the ROTATING cache shards the corpus under the budget and rotates
    # shards through HBM per epoch (metadata-only steady state + one
    # flats transfer per shard per epoch).  Keep <= ~40% of free HBM --
    # two shards are briefly co-resident during rotation.
    device_cache_budget_gb: float = 0.0
    # Spill rotating-cache shard flats to disk memmaps under this dir so
    # host RAM holds at most one staged shard (empty = keep in RAM).
    device_cache_spill_dir: str = ""
    # Ship host-loader waveforms as int16 and cast on device: halves the
    # host->device bytes for corpora too large for the device cache.
    # Costs one int16 quantization (-96 dBFS) on float sources.
    int16_transport: bool = False


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    checkpoint_filepath: str = ""
    batch_size: int = 2
    num_iter_print: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    dsp: DSPConfig = dataclasses.field(default_factory=DSPConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)


def _get(cp: configparser.ConfigParser, section: str, key: str, default=None):
    if cp.has_option(section, key):
        return cp.get(section, key)
    return default


def load_ini_config(path: str) -> Config:
    """Load a reference-format INI file into a typed `Config`.

    Accepts the exact section/key layout of the reference's cfg files
    (`Work/*/cfg/*.cfg`): ``[training] [testing] [inference] [model] [data]``.
    """
    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found: {path}")

    dsp_kwargs = {}
    if cp.has_option("data", "sample_rate"):
        dsp_kwargs["sample_rate"] = int(cp.get("data", "sample_rate"))
    if cp.has_option("data", "window_ms"):
        dsp_kwargs["window_ms"] = float(cp.get("data", "window_ms"))
    if cp.has_option("data", "stride_ms"):
        dsp_kwargs["stride_ms"] = float(cp.get("data", "stride_ms"))
    if cp.has_option("data", "windows"):
        win = cp.get("data", "windows")
        if win != "hamming":
            # Reference quirk: cfg says hanning but the code never reads the
            # key and always uses Hamming (Appendix A.1).  We follow the
            # *behaviour* unless the new-style key `windows_effective` is set.
            logger.warning(
                "[data] windows=%s requested, but the reference behaviour is "
                "hamming (the key is dead in the reference); using hamming. "
                "Set [data] windows_effective to override.",
                win,
            )
    if cp.has_option("data", "windows_effective"):
        dsp_kwargs["window_name"] = cp.get("data", "windows_effective")
    if cp.has_option("data", "nfft"):
        raw_nfft = cp.get("data", "nfft")
        try:
            # exact float compare: "256.9" must warn, not truncate to 256
            nfft = float(raw_nfft)
        except (ValueError, OverflowError):
            # the key is dead in the reference, so even junk values must
            # not abort config load -- warn like any other non-256 value
            nfft = None
        if nfft != 256.0:
            # Reference quirk: like `windows`, `nfft` is parsed by no
            # reference code path -- analysis FFT size is hardcoded to
            # 256 (Appendix A.2).  Follow the behaviour and say so.
            logger.warning(
                "[data] nfft=%s requested, but the reference behaviour is "
                "256 (the key is dead in the reference); using 256.",
                raw_nfft,
            )
    dsp = DSPConfig(**dsp_kwargs)

    model = ModelConfig(
        net_arch=_get(cp, "model", "net_arch", "RCED"),
        net_work=_get(cp, "model", "net_work", "FullyCNN"),
        feature_dim=int(_get(cp, "data", "feature_dim", dsp.num_bins)),
        compute_dtype=_get(cp, "model", "compute_dtype", "float32"),
        fused_inference=str(
            _get(cp, "model", "fused_inference", "False")
        ).lower() in ("1", "true", "yes"),
        blocked_compute=str(
            _get(cp, "model", "blocked_compute", "False")
        ).lower() in ("1", "true", "yes"),
        blocked_fb=int(_get(cp, "model", "blocked_fb", 8)),
        dw_pallas=str(_get(cp, "model", "dw_pallas", "False")).lower()
        in ("1", "true", "yes"),
    )

    train_kwargs = {}
    if cp.has_section("training"):
        g = lambda k, d: _get(cp, "training", k, d)  # noqa: E731
        train_kwargs = dict(
            epochs=int(g("epochs", 5)),
            batch_size=int(g("batch_size", 2)),
            lr=float(g("lr", 1.5e-3)),
            warmup_steps=int(g("warmup_steps", 10000)),
            continue_train=str(g("continue_train", "True")).lower()
            in ("1", "true", "yes"),
            checkpoints_path=g("checkpoints_path", "checkpoints"),
            base_checkpoint_file=g("base_checkpoint_file", ""),
            num_iter_print=int(g("num_iter_print", 100)),
            log_dir=g("log_dir", "checkpoints/log"),
            seed=int(g("seed", 0)),
            mask_loss=str(g("mask_loss", "False")).lower() in ("1", "true", "yes"),
            data_parallel=int(g("data_parallel", 1)),
            steps_per_call=int(g("steps_per_call", 1)),
            valid_every_epochs=int(g("valid_every_epochs", 5)),
        )
    train = TrainConfig(**train_kwargs)

    def opt(section, key):
        return cp.get(section, key) if cp.has_option(section, key) else None

    data = DataConfig(
        train_manifest_path=_get(cp, "data", "train_manifest_path", ""),
        val_manifest_path=_get(cp, "data", "val_manifest_path", ""),
        test_manifest_path=_get(cp, "data", "test_manifest_path", ""),
        train_noise_manifest=opt("data", "train_noise_manifest"),
        val_noise_manifest=opt("data", "val_noise_manifest"),
        test_noise_manifest=opt("data", "test_noise_manifest"),
        snr=float(_get(cp, "data", "snr", 0.0)),
        min_duration=float(_get(cp, "data", "min_duration", 0.4)),
        max_duration=float(_get(cp, "data", "max_duration", "inf")),
        audio_save_path=_get(cp, "data", "audio_save_path", "denoise"),
        num_workers=int(_get(cp, "data", "num_workers", 4)),
        use_native=str(_get(cp, "data", "use_native", "False")).lower()
        in ("1", "true", "yes"),
        seed=int(_get(cp, "data", "seed", 0)),
        use_device_cache=str(
            _get(cp, "data", "use_device_cache", "False")
        ).lower() in ("1", "true", "yes"),
        device_cache_budget_gb=float(
            _get(cp, "data", "device_cache_budget_gb", 0.0)
        ),
        device_cache_spill_dir=_get(
            cp, "data", "device_cache_spill_dir", ""
        ),
        int16_transport=str(
            _get(cp, "data", "int16_transport", "False")
        ).lower() in ("1", "true", "yes"),
    )

    eval_section = "testing" if cp.has_section("testing") else "inference"
    eval_cfg = EvalConfig(
        checkpoint_filepath=_get(cp, eval_section, "checkpoint_filepath", "") or "",
        batch_size=int(_get(cp, eval_section, "batch_size", 2)),
        num_iter_print=int(_get(cp, eval_section, "num_iter_print", 1)),
    )

    return Config(dsp=dsp, model=model, train=train, data=data, eval=eval_cfg)
