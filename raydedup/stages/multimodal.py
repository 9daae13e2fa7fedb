"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Image/audio decode libraries are not available in this environment, so the
DECODE KERNELS are stubbed (deterministic fake mode for tests, explicit
``NotImplementedError`` otherwise) while all the Ray-side plumbing —
schema, actor-pool signature, small-batch sizing for large binaries,
output layout — is real and tested (task brief: "make the plumbing real").

Payload convention: ``payload: binary`` + ``media_type: string`` +
``meta_w/meta_h`` (images) or ``meta_sr/meta_samples`` (audio). The fake
decoder derives deterministic dimensions from the payload bytes so tests
can assert end-to-end without real codecs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def attach_fake_payloads(ds, text_col: str = "text"):
    """Derive a deterministic binary payload per row (sha-seeded bytes) —
    the test stand-in for reading real image/audio bytes."""

    def attach(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
        payloads, kinds = [], []
        for t in texts:
            digest = hashlib.sha256(t.encode()).digest()
            # payload = digest-seeded pseudo-bytes; size 256..4351
            size = 256 + digest[0] * 16
            reps = -(-size // len(digest))
            payloads.append((digest * reps)[:size])
            kinds.append("image/fake" if digest[1] % 2 == 0 else "audio/fake")
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column("media_type", pa.array(kinds, type=pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


class DecodeImage:
    """Actor-pool image decoder. ``fake=True`` derives (w, h) from bytes;
    ``fake=False`` raises NotImplementedError (no codec libs here — slot
    in PIL/cv2 via this same __init__/__call__ signature)."""

    def __init__(self, fake: bool = True, resize_to: tuple[int, int] | None = None):
        self.fake = fake
        self.resize_to = resize_to

    def _decode(self, payload: bytes) -> tuple[int, int]:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires PIL/cv2 — not available in this "
                "environment; construct with fake=True for plumbing tests"
            )
        w = 16 + payload[0] if payload else 16
        h = 16 + (payload[1] if len(payload) > 1 else 0)
        return w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dims = [self._decode(p or b"") for p in payloads]
        w = [d[0] for d in dims]
        h = [d[1] for d in dims]
        if self.resize_to:
            w = [self.resize_to[0]] * len(dims)
            h = [self.resize_to[1]] * len(dims)
        return (
            batch.append_column("meta_w", pa.array(w, type=pa.int32()))
            .append_column("meta_h", pa.array(h, type=pa.int32()))
        )


def decode_images(ds, fake: bool = True,
                  resize_to: tuple[int, int] | None = None,
                  batch_size: int = 64, concurrency=(1, 8)):
    """Small batches: payload bytes dominate block size, so batch_size is
    deliberately tiny (the memory-aware knob for binary columns)."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake, "resize_to": resize_to},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSample:
    """Video/audio frame sampler stub: emits every n-th 'frame index' with
    a deterministic feature hash per frame (real samplers decode here)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = every_n
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling needs av/ffmpeg")
        rows = []
        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py() or b""
            n_frames = max(1, len(payload) // 64)
            for f in range(0, n_frames, self.every_n):
                h = hashlib.blake2b(payload[f * 64 : (f + 1) * 64],
                                    digest_size=8).digest()
                rows.append(
                    {
                        "row_key": batch["row_key"][i].as_py()
                        if "row_key" in batch.column_names else str(i),
                        "frame_idx": f,
                        "frame_hash": int.from_bytes(h, "big") >> 1,
                    }
                )
        if not rows:
            return pa.table(
                {"row_key": pa.array([], type=pa.string()),
                 "frame_idx": pa.array([], type=pa.int32()),
                 "frame_hash": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "row_key": pa.array([r["row_key"] for r in rows], type=pa.string()),
                "frame_idx": pa.array([r["frame_idx"] for r in rows], type=pa.int32()),
                "frame_hash": pa.array([r["frame_hash"] for r in rows], type=pa.int64()),
            }
        )


def sample_frames(ds, every_n: int = 10, fake: bool = True):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n, "fake": fake},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 8),
        num_cpus=1,
    )
