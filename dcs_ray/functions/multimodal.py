"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / resize / feature-extract run as actor-pool
``map_batches`` stages (model/codec loaded once per actor in
``__init__``). The decode kernels themselves are STUBBED — the sandbox
has no image/audio libraries — behind ``DecodeUnavailable`` or a
deterministic fake, but the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.

At scale: binary payloads dominate block size — use small
``batch_size`` (e.g. 32–128) and ``DataContext.target_max_block_size``
sized so batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: codec libraries absent in sandbox."""


def _concat_binary(payloads: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, per-row offsets) over a binary column —
    zero-copy view so the fake kernels stay vectorized across rows."""
    arr = payloads.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lengths = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return np.empty(0, np.uint8), offsets
    buf = np.frombuffer(data_buf, dtype=np.uint8)
    raw_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    start = arr.offset
    return buf[raw_off[start] : raw_off[start + len(arr)]], offsets


class ImageFeatureExtractor:
    """Actor-pool stage: binary image -> fixed-dim feature vector.

    Use as ``ds.map_batches(ImageFeatureExtractor, concurrency=N,
    batch_size=64, num_cpus=1)``. ``__init__`` loads the (stub) model
    once per actor; ``__call__`` handles one Arrow batch.
    """

    def __init__(self, dim: int = 16, fake: bool = True):
        self.dim = dim
        self.fake = fake
        if not fake:
            raise DecodeUnavailable("no image decode library in this environment")
        # deterministic fake "model": fixed projection seeded once per actor
        rng = np.random.default_rng(0)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        n = len(payloads)
        # deterministic fake decode: per-row byte histogram → projection,
        # vectorized as ONE bincount over (row, byte) composite keys —
        # no Python loop over rows (the real decode would be a batched
        # library call in the same position)
        buf, offsets = _concat_binary(payloads)
        lengths = np.diff(offsets)
        hist = np.zeros((n, 256), dtype=np.int64)
        if len(buf):
            row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
            flat = np.bincount(row_of * 256 + buf, minlength=n * 256)
            hist = flat.reshape(n, 256)
        norm = hist / np.maximum(lengths, 1)[:, None]
        feats = norm.astype(np.float32) @ self.proj
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool stage: binary audio → per-clip feature vector
    (mel-spectrogram-shaped stub). Real decode raises
    ``DecodeUnavailable``; the deterministic fake treats the payload as
    PCM bytes and emits windowed RMS energies — the plumbing (schema,
    windowing layout, actor state) matches a real extractor."""

    def __init__(self, n_windows: int = 8, fake: bool = True):
        self.n_windows = n_windows
        if not fake:
            raise DecodeUnavailable("no audio codec library in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        n = len(payloads)
        feats = np.zeros((n, self.n_windows), dtype=np.float32)
        # windowed RMS vectorized across rows: cumulative sum of squared
        # PCM once, then each window's energy is a difference of two
        # cumsum reads — n_windows iterations total, none over rows
        buf, offsets = _concat_binary(payloads)
        lengths = np.diff(offsets)
        if len(buf):
            pcm2 = (buf.astype(np.float64) - 128.0) ** 2
            cs = np.concatenate(([0.0], np.cumsum(pcm2)))
            w = np.maximum(1, lengths // self.n_windows)
            for j in range(self.n_windows):
                start = offsets[:-1] + j * w
                end = np.minimum(start + w, offsets[1:])
                valid = start < offsets[1:]
                cnt = np.maximum(end - start, 1)
                s = np.clip(cs[np.minimum(end, offsets[1:])] - cs[np.minimum(start, offsets[1:])], 0, None)
                feats[:, j] = np.where(valid, np.sqrt(s / cnt), 0.0).astype(np.float32)
        # empty payloads mimic a single zero byte (rms of -128)
        empty = lengths == 0
        if empty.any():
            feats[empty] = 0.0
            feats[empty, 0] = 128.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: binary video → k sampled "frames" (each an
    opaque binary slice + frame index + timestamp). Real demux raises
    ``DecodeUnavailable``; the fake slices the payload into equal chunks
    — output layout (one row per sampled frame, ``flat_map`` shape via a
    widening map_batches) is the real contract."""

    def __init__(self, k: int = 4, fake: bool = True):
        self.k = k
        if not fake:
            raise DecodeUnavailable("no video demuxer in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = self.k
        ids = batch["media_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dur = (
            batch["duration_ms"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        buf, offsets = _concat_binary(batch["payload"].combine_chunks())
        lengths = np.diff(offsets)
        # frame (i, j) is payload_i[j*step_i : (j+1)*step_i] — all n*k
        # slices gathered from the flat buffer in one fancy-index pass
        step = np.maximum(1, lengths // k)  # (n,)
        j = np.arange(k, dtype=np.int64)
        starts = np.minimum(offsets[:-1, None] + j[None, :] * step[:, None], offsets[1:, None])
        ends = np.minimum(starts + step[:, None], offsets[1:, None])
        slice_lens = (ends - starts).ravel()
        out_off = np.concatenate(([0], np.cumsum(slice_lens)))
        gather = (
            np.repeat(starts.ravel(), slice_lens)
            + (np.arange(out_off[-1], dtype=np.int64) - np.repeat(out_off[:-1], slice_lens))
        )
        frames = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n * k,
            [None, pa.py_buffer(out_off.astype(np.int64)), pa.py_buffer(buf[gather])],
        )
        return pa.table(
            {
                "media_id": pa.array(np.repeat(ids, k), pa.int64()),
                "frame_idx": pa.array(np.tile(j, n).astype(np.int32), pa.int32()),
                "ts_ms": pa.array(
                    ((dur[:, None] * j[None, :]) // k).ravel().astype(np.int32), pa.int32()
                ),
                "frame": frames.cast(pa.binary()),
            }
        )


def extract_audio_features(ds: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatureExtractor, concurrency=concurrency, batch_size=64,
        batch_format="pyarrow", num_cpus=1,
    )


def sample_video_frames(ds: ray.data.Dataset, k: int = 4, concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"k": k}, concurrency=concurrency,
        batch_size=32, batch_format="pyarrow", num_cpus=1,
    )


def synthesize_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 16, np.int32), pa.int32()),
            "height": pa.array(np.full(n, 16, np.int32), pa.int32()),
            "duration_ms": pa.array(np.zeros(n, np.int32), pa.int32()),
        }
    )


def extract_image_features(ds: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatureExtractor,
        concurrency=concurrency,
        batch_size=64,
        batch_format="pyarrow",
        num_cpus=1,
    )
