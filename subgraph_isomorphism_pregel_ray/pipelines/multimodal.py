"""Multimodal columns: binary payloads + typed metadata, REAL numpy codecs.

Images/audio/video are ``binary`` columns with typed metadata; decode and
feature extraction are actor-pool ``map_batches`` stages (decoder state built
once per actor in ``__init__``). The container ships no codec libraries, so
the formats here are the ones a numpy-only build can decode FOR REAL:

* image — binary **PPM (P6)**: ``P6\\n<w> <h>\\n255\\n`` + interleaved RGB
  bytes (the classic uncompressed interchange format; byte-exact roundtrip).
* audio — raw **PCM int16 LE** mono samples.
* video — **concatenated P6 frames** (constant frame geometry per row).

The pluggable-decoder seam stays: pass a PIL/libjpeg/ffmpeg wrapper via
``fn_constructor_kwargs={"decoder": ...}`` in a full build and every actor
constructs it once; the default decoders below are real, not fakes.

Scale notes: binary payloads are wide → small ``batch_size`` (64) and
``batch_format="pyarrow"`` (binary columns don't round-trip pandas cleanly);
blocks stay small enough that batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np

from ..functions.rounding import round_half_away
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "encode_ppm",
    "decode_ppm",
    "decode_ppm_stream",
    "encode_pcm",
    "decode_pcm",
    "synth_media_table",
    "ImageDecodeStage",
    "ImageResizeStage",
    "FrameSampleStage",
    "decode_features",
]

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


# --- real numpy-only codecs -------------------------------------------------
def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _parse_ppm_header(buf: bytes, off: int = 0):
    """→ (width, height, pixel_data_offset). Minimal P6 parser (no comment
    lines — our writer never emits them; a full build swaps the decoder)."""
    assert buf[off : off + 2] == b"P6", "not a P6 ppm"
    parts = []
    i = off + 2
    while len(parts) < 3:
        while buf[i : i + 1].isspace():
            i += 1
        j = i
        while not buf[j : j + 1].isspace():
            j += 1
        parts.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    assert maxval == 255
    return w, h, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """binary PPM (P6) → (h, w, 3) uint8."""
    w, h, off = _parse_ppm_header(payload)
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
    )


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames → list of (h, w, 3) arrays (video decode)."""
    frames, off = [], 0
    while off < len(payload):
        w, h, data_off = _parse_ppm_header(payload, off)
        end = data_off + w * h * 3
        frames.append(
            np.frombuffer(payload, np.uint8, count=w * h * 3, offset=data_off)
            .reshape(h, w, 3)
        )
        off = end
    return frames


def encode_pcm(samples: np.ndarray) -> bytes:
    return samples.astype("<i2").tobytes()


def decode_pcm(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<i2")


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL encoded payloads: PPM images,
    PCM audio, concatenated-PPM video."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads, widths, heights, nframes = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img))
            widths.append(64), heights.append(48), nframes.append(1)
        elif kind == "audio":
            payloads.append(
                encode_pcm(rng.integers(-(2 ** 15), 2 ** 15, 1024).astype(np.int16))
            )
            widths.append(0), heights.append(0), nframes.append(1)
        else:
            fr = [
                encode_ppm(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8))
                for _ in range(30)
            ]
            payloads.append(b"".join(fr))
            widths.append(16), heights.append(12), nframes.append(30)
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": payloads,
        "width": np.asarray(widths, dtype=np.int32),
        "height": np.asarray(heights, dtype=np.int32),
        "n_frames": np.asarray(nframes, dtype=np.int32),
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class ImageDecodeStage:
    """Actor-pool stage: kind-dispatched decode + mean/std features per row
    (image → pixels; audio → PCM samples; video → first frame's pixels).

    Use: ``ds.map_batches(ImageDecodeStage, batch_size=64, concurrency=N,
    num_cpus=1, batch_format="pyarrow")``.

    ``decoder`` is the pluggable codec seam for the image path: any callable
    ``(payload: bytes) -> np.ndarray`` (e.g. a PIL/libjpeg wrapper via
    ``fn_constructor_kwargs={"decoder": my_decoder}``). Constructed ONCE per
    actor — codec/model setup belongs here, not in ``__call__``. Default =
    the real numpy PPM decoder.
    """

    def __init__(self, decoder=None):
        self._decode = decoder if decoder is not None else decode_ppm

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mean = np.empty(len(ids))
        std = np.empty(len(ids))
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            if k == "audio":
                x = decode_pcm(p).astype(np.float64)
            elif k == "video":
                x = decode_ppm_stream(p)[0].astype(np.float64)
            else:
                x = self._decode(p).astype(np.float64)
            mean[i] = x.mean()
            std[i] = x.std()
        return pa.table(
            {
                "media_id": ids,
                "px_mean": round_half_away(mean, 6),
                "px_std": round_half_away(std, 6),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: REAL area-mean resize of decoded PPM images
    (exact block averaging when dims divide; index-strided otherwise),
    re-encoded as PPM thumbnails."""

    def __init__(self, out_w: int = 16, out_h: int = 12, decoder=None):
        self.out_w, self.out_h = out_w, out_h
        self._decode = decoder if decoder is not None else decode_ppm

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        kinds = batch["kind"].to_pylist()
        keep, out = [], []
        for i, (k, p) in enumerate(zip(kinds, batch["payload"].to_pylist())):
            if k != "image":
                continue
            img = self._decode(p)
            h, w, _ = img.shape
            if h % self.out_h == 0 and w % self.out_w == 0:
                small = (
                    img.reshape(
                        self.out_h, h // self.out_h, self.out_w, w // self.out_w, 3
                    )
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
            else:
                yi = np.arange(self.out_h) * h // self.out_h
                xi = np.arange(self.out_w) * w // self.out_w
                small = img[np.ix_(yi, xi)]
            keep.append(i)
            out.append(encode_ppm(small))
        return pa.table(
            {
                "media_id": ids[keep] if keep else np.array([], np.int64),
                "thumb": pa.array(out, type=pa.binary()),
                "width": np.full(len(keep), self.out_w, dtype=np.int32),
                "height": np.full(len(keep), self.out_h, dtype=np.int32),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: REAL frame sampling — split the concatenated-PPM
    video payload, keep every k-th frame, emit its index and mean pixel."""

    def __init__(self, every: int = 10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        kinds = batch["kind"].to_pylist()
        out_id, out_f, out_m = [], [], []
        for i, (k, p) in enumerate(zip(kinds, batch["payload"].to_pylist())):
            if k != "video":
                continue
            frames = decode_ppm_stream(p)
            for f in range(0, len(frames), self.every):
                out_id.append(ids[i])
                out_f.append(f)
                out_m.append(frames[f].astype(np.float64).mean())
        return pa.table(
            {
                "media_id": np.asarray(out_id, np.int64),
                "frame": np.asarray(out_f, np.int32),
                "frame_mean": round_half_away(np.asarray(out_m, np.float64), 6),
            }
        )


def decode_features(media_ds, concurrency: int = 2, decoder=None):
    """The canonical actor-pool invocation (tested in tests/). ``decoder``
    plugs an alternative image codec into every actor (see
    ImageDecodeStage); all three modalities decode for real by default."""
    kwargs = {"fn_constructor_kwargs": {"decoder": decoder}} if decoder else {}
    return media_ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
        **kwargs,
    )
