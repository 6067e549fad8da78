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
