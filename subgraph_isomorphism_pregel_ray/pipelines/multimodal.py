"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct; decode and
feature extraction are actor-pool ``map_batches`` stages (decoder state built
once per actor in ``__init__``). The actual codec libraries are NOT in this
container, so the decode kernels are deterministic fakes behind the same
interface (clearly marked); the Ray-side plumbing — schema, batch sizing for
wide binary rows, actor signature, output layout — is real and tested.

Scale notes: binary payloads are wide → small ``batch_size`` (64) and
``batch_format="pyarrow"`` (binary columns don't round-trip pandas cleanly);
blocks stay small enough that batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np

from ..functions.rounding import round_half_away
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "synth_media_table", "ImageDecodeStage",
           "ImageResizeStage", "FrameSampleStage", "decode_features"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, 256 + (i % 7) * 64, dtype=np.uint8).tobytes() for i in range(n)],
        "width": np.full(n, 64, dtype=np.int32),
        "height": np.full(n, 48, dtype=np.int32),
        "n_frames": np.array([1 if i % 3 == 0 else 30 for i in range(n)], dtype=np.int32),
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real build calls PIL/libjpeg here. Deterministic fake: byte
    stream tiled to (height, width) uint8 — keeps shapes/dtypes honest."""
    b = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(b)))
    return np.tile(b, reps)[: width * height].reshape(height, width)


class ImageDecodeStage:
    """Actor-pool stage: decode + mean/std features per image.

    Use: ``ds.map_batches(ImageDecodeStage, batch_size=64, concurrency=N,
    num_cpus=1, batch_format="pyarrow")``.

    ``decoder`` is the pluggable codec seam: any callable
    ``(payload: bytes, width: int, height: int) -> np.ndarray[h, w]``.
    A real build passes e.g. a PIL/libjpeg wrapper via
    ``fn_constructor_kwargs={"decoder": my_decoder}``; the default is the
    deterministic fake (no codec libs in this container). Constructed ONCE
    per actor — codec/model setup belongs here, not in ``__call__``.
    """

    def __init__(self, decoder=None):
        self._decode = decoder if decoder is not None else _fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        w = batch["width"].to_numpy()
        h = batch["height"].to_numpy()
        payloads = batch["payload"].to_pylist()
        mean = np.empty(len(ids))
        std = np.empty(len(ids))
        for i, p in enumerate(payloads):
            img = self._decode(p, int(w[i]), int(h[i]))
            mean[i] = img.mean()
            std[i] = img.std()
        return pa.table(
            {"media_id": ids, "px_mean": round_half_away(mean, 6), "px_std": round_half_away(std, 6)}
        )


class ImageResizeStage:
    """Actor-pool stage: nearest-neighbor resize of the fake-decoded image."""

    def __init__(self, out_w: int = 16, out_h: int = 12):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        w = batch["width"].to_numpy()
        h = batch["height"].to_numpy()
        out = []
        for i, p in enumerate(batch["payload"].to_pylist()):
            img = _fake_decode(p, int(w[i]), int(h[i]))
            yi = (np.arange(self.out_h) * img.shape[0] // self.out_h)
            xi = (np.arange(self.out_w) * img.shape[1] // self.out_w)
            out.append(img[np.ix_(yi, xi)].tobytes())
        return pa.table(
            {
                "media_id": ids,
                "thumb": pa.array(out, type=pa.binary()),
                "width": np.full(len(ids), self.out_w, dtype=np.int32),
                "height": np.full(len(ids), self.out_h, dtype=np.int32),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: sample every k-th frame index of a video row."""

    def __init__(self, every: int = 10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf = batch["media_id"].to_numpy(), batch["n_frames"].to_numpy()
        out_id, out_f = [], []
        for i, n in zip(ids, nf):
            fr = np.arange(0, int(n), self.every, dtype=np.int32)
            out_id.append(np.full(len(fr), i, dtype=np.int64))
            out_f.append(fr)
        return pa.table(
            {
                "media_id": np.concatenate(out_id) if out_id else np.array([], np.int64),
                "frame": np.concatenate(out_f) if out_f else np.array([], np.int32),
            }
        )


def decode_features(media_ds, concurrency: int = 2, decoder=None):
    """The canonical actor-pool invocation (tested in tests/test_textops.py).
    ``decoder`` plugs a real codec into every actor (see ImageDecodeStage)."""
    kwargs = {"fn_constructor_kwargs": {"decoder": decoder}} if decoder else {}
    return media_ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
        **kwargs,
    )
