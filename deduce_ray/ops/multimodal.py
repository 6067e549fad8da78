"""Multimodal column plumbing: opaque binary payloads with typed metadata,
processed by actor-pool map_batches stages.

The actual media codecs (PIL / torchaudio / ffmpeg) are NOT available in
this environment, so decoding is STUBBED: ``decode_image``/``decode_audio``
raise NotImplementedError unless the stage is constructed with
``fake_decoder=True``, which produces a deterministic pseudo-decode from the
payload bytes.  Everything Ray-side — schema, small batch sizes for large
payloads, actor lifecycle, feature output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),           # image | audio | video
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),        # opaque encoded bytes
    ]
)


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media rows derived from doc_id (test fixture
    generator — payload bytes are a pure function of the id)."""
    ids = batch.column("doc_id").to_pylist()
    payloads, kinds, mimes, widths, heights = [], [], [], [], []
    for i in ids:
        seed = hashlib.sha256(f"media:{i}".encode()).digest()
        payloads.append(seed * 8)  # 256 bytes of deterministic "encoding"
        kinds.append("image" if i % 3 else "audio")
        mimes.append("image/png" if i % 3 else "audio/wav")
        widths.append(16 + (i % 8) * 16)
        heights.append(16 + (i % 5) * 16)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds),
            "mime": pa.array(mimes),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — no image codec in this environment.  Real deployments plug in
    PIL/turbojpeg here; the fake path is used by tests and benchmarks."""
    raise NotImplementedError(
        "image codecs are not available in this environment; construct the "
        "stage with fake_decoder=True for the deterministic stand-in"
    )


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    digest = hashlib.sha256(payload).digest()
    raw = (digest * (n // len(digest) + 1))[:n]
    return np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float32) / 255.0


class MediaFeatureExtractor:
    """Actor-pool stage: decode payloads and emit fixed-dim features.

    Use small ``batch_size`` for large payloads (a batch x concurrency must
    fit the worker heap); model/codec setup belongs here in ``__init__``,
    once per actor.
    """

    FEATURE_DIM = 32

    def __init__(self, fake_decoder: bool = False) -> None:
        self.fake_decoder = fake_decoder

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.fake_decoder:
            return _fake_decode(payload, 64 * 64)
        return decode_image(payload, width, height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()

        features = []
        for payload, w, h in zip(payloads, widths, heights):
            pixels = self._decode(payload, w, h)
            # mean-pool into a fixed-dim feature vector
            pooled = pixels[: (len(pixels) // self.FEATURE_DIM) * self.FEATURE_DIM]
            pooled = pooled.reshape(self.FEATURE_DIM, -1).mean(axis=1)
            features.append([round(float(x), 6) for x in pooled])

        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "feature": pa.array(features, type=pa.list_(pa.float32())),
            }
        )


def extract_media_features(ds, fake_decoder: bool = False, concurrency=(1, 4),
                           batch_size: int = 16):
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"fake_decoder": fake_decoder},
    )


class ImageResizer:
    """Actor-pool stage: decode image payloads and emit a fixed (target x
    target) nearest-neighbour downsample as a flat float32 vector.

    Same contract as MediaFeatureExtractor: codec setup belongs in
    ``__init__`` (once per actor); the real decoder is stubbed in this
    environment (``fake_decoder=True`` produces the deterministic
    stand-in), while the resampling math, schema, and batch plumbing are
    real.  Non-image rows pass through with a null pixel column.
    """

    def __init__(self, target: int = 8, fake_decoder: bool = False) -> None:
        self.target = target
        self.fake_decoder = fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()

        pixels_out: list[list[float] | None] = []
        for kind, payload, w, h in zip(kinds, payloads, widths, heights):
            if kind != "image":
                pixels_out.append(None)
                continue
            if self.fake_decoder:
                img = _fake_decode(payload, w * h).reshape(h, w)
            else:
                img = decode_image(payload, w, h)
            ys = (np.arange(self.target) * h) // self.target
            xs = (np.arange(self.target) * w) // self.target
            small = img[np.ix_(ys, xs)]
            pixels_out.append([round(float(x), 6) for x in small.ravel()])

        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds),
                "pixels": pa.array(pixels_out, type=pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool flat-map stage: decode video payloads and emit one row
    per SAMPLED frame (every ``stride``-th of ``n_frames``), each with a
    small per-frame feature vector — the shape a video-pretraining
    pipeline needs (batch in: one row per video; batch out: multiple rows
    per video, schema change included)."""

    FRAME_DIM = 16

    def __init__(self, stride: int = 4, fake_decoder: bool = False) -> None:
        self.stride = stride
        self.fake_decoder = fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_frames_col = (
            batch.column("n_frames").to_pylist()
            if "n_frames" in batch.schema.names
            else [0] * len(ids)
        )

        out_ids, out_idx, out_feats = [], [], []
        for mid, kind, payload, n_frames in zip(ids, kinds, payloads, n_frames_col):
            if kind != "video" or not n_frames:
                continue
            if self.fake_decoder:
                frames = _fake_decode(payload, n_frames * self.FRAME_DIM).reshape(
                    n_frames, self.FRAME_DIM
                )
            else:
                raise NotImplementedError(
                    "video codecs are not available in this environment; "
                    "construct the stage with fake_decoder=True"
                )
            for f in range(0, n_frames, self.stride):
                out_ids.append(mid)
                out_idx.append(f)
                out_feats.append([round(float(x), 6) for x in frames[f]])

        return pa.table(
            {
                "media_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_feature": pa.array(out_feats, type=pa.list_(pa.float32())),
            }
        )


def synthesize_video_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake VIDEO rows (kind=video, n_frames derived from the
    id) — companion fixture generator to synthesize_media_batch."""
    ids = batch.column("doc_id").to_pylist()
    payloads, n_frames = [], []
    for i in ids:
        seed = hashlib.sha256(f"video:{i}".encode()).digest()
        payloads.append(seed * 16)
        n_frames.append(8 + (i % 5) * 4)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["video"] * len(ids)),
            "mime": pa.array(["video/mp4"] * len(ids)),
            "width": pa.array([64] * len(ids), type=pa.int32()),
            "height": pa.array([64] * len(ids), type=pa.int32()),
            "n_frames": pa.array(n_frames, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def resize_images(ds, target: int = 8, fake_decoder: bool = False,
                  concurrency=(1, 4), batch_size: int = 16):
    return ds.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"target": target, "fake_decoder": fake_decoder},
    )


def sample_frames(ds, stride: int = 4, fake_decoder: bool = False,
                  concurrency=(1, 4), batch_size: int = 8):
    # small batch_size: a video batch x concurrency must fit the worker
    # heap once payloads are real encodings
    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride, "fake_decoder": fake_decoder},
    )
