"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

The decode kernels are REAL: pure-numpy decoders for PPM (P6), BMP
(24-bit uncompressed) and WAV (PCM16) — formats simple enough to parse
without codec libraries — plus a nearest-neighbor resize. If PIL is
importable it is tried first for unknown formats; otherwise unknown
magic bytes raise ``ValueError``. Video frame sampling remains a
documented stub (real sampling needs av/ffmpeg, not in this
environment); its Ray-side plumbing (binary column, small-batch actor
pool, exploded output schema) is real and tested.

Payload convention: ``payload: binary`` + ``media_type: string`` +
``meta_w/meta_h`` (+ ``pix_sum`` checksum) for images, or
``meta_sr/meta_samples`` for audio.

``attach_synthetic_images`` generates genuine PPM bytes whose dimensions
and pixel values are closed-form functions of the row id, so the decode
path is exercised on real bytes AND value-checkable by a SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# --- real codecs (pure numpy) ----------------------------------------------


def encode_ppm(w: int, h: int, pixels: np.ndarray) -> bytes:
    """(w, h, flat uint8 RGB array of size 3*w*h) → binary PPM (P6)."""
    assert pixels.size == 3 * w * h
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """binary PPM (P6, maxval 255) → (w, h, (h, w, 3) uint8 array)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace-separated w h maxval, single whitespace,
    # then raw RGB. Comments (#...) allowed per spec.
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=pos)
    return w, h, data.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit BMP → (w, h, (h, w, 3) uint8 RGB array)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (3 * w + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    img = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return w, h, (img[::-1] if flip else img).copy()


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """mono PCM16 samples → binary RIFF/WAVE."""
    pcm = samples.astype("<i2").tobytes()
    hdr = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little")
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, n_samples, int16 array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sr, n_channels, bits = None, 1, 16
    samples = np.empty(0, dtype=np.int16)
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            n_channels = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            if bits != 16:
                raise ValueError("only PCM16 WAV supported")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sr is None:
        raise ValueError("WAV missing fmt chunk")
    return sr, len(samples) // max(n_channels, 1), samples


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(h, w, 3) → (out_h, out_w, 3) nearest-neighbor resize."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi[:, None], xi[None, :]]


# --- payload generators (tests / oracle-checkable corpora) ------------------


def attach_fake_payloads(ds, text_col: str = "text"):
    """Derive a deterministic binary payload per row (sha-seeded bytes) —
    the plumbing-test stand-in for reading real image/audio bytes."""

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


def attach_synthetic_images(ds, id_col: str = "doc_id"):
    """REAL PPM payloads with closed-form content: for row id d,
    w = 16 + d % 17, h = 16 + d % 13, pixel[i] = (7*d + i) % 256.
    The SQL oracle recomputes (w, h, sum(pixels)) from d alone, so the
    real decoder is value-checked end-to-end."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for d in ids:
            d = int(d)
            w, h = 16 + d % 17, 16 + d % 13
            pix = (np.int64(7 * d) + np.arange(3 * w * h, dtype=np.int64)) % 256
            payloads.append(encode_ppm(w, h, pix.astype(np.uint8)))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["image/ppm"] * len(ids), type=pa.string()),
        )

    return ds.map_batches(attach, batch_format="pyarrow")


# --- decode stages ----------------------------------------------------------


class DecodeImage:
    """Actor-pool image decoder. Real mode (default) parses PPM/BMP with
    the numpy codecs (PIL, if importable, handles other formats); fake
    mode derives (w, h) from bytes for plumbing tests of opaque payloads."""

    def __init__(self, fake: bool = False,
                 resize_to: tuple[int, int] | None = None):
        self.fake = fake
        self.resize_to = resize_to
        self.pil = None
        if not fake:
            try:  # optional: handles PNG/JPEG when available
                from PIL import Image  # noqa: PLC0415

                self.pil = Image
            except ImportError:
                self.pil = None

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray | None]:
        if self.fake:
            w = 16 + payload[0] if payload else 16
            h = 16 + (payload[1] if len(payload) > 1 else 0)
            return w, h, None
        if payload.startswith(b"P6"):
            return decode_ppm(payload)
        if payload.startswith(b"BM"):
            return decode_bmp(payload)
        if self.pil is not None:
            import io

            img = self.pil.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return img.width, img.height, arr
        raise ValueError(
            f"unsupported image format (magic {payload[:4]!r}); "
            "PPM/BMP decode natively, others need PIL"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws, hs, sums = [], [], []
        for p in payloads:
            w, h, img = self._decode(p or b"")
            if img is not None and self.resize_to:
                img = resize_nearest(img, *self.resize_to)
                w, h = self.resize_to
            elif self.resize_to:
                w, h = self.resize_to
            ws.append(w)
            hs.append(h)
            sums.append(int(img.sum()) if img is not None else 0)
        return (
            batch.append_column("meta_w", pa.array(ws, type=pa.int32()))
            .append_column("meta_h", pa.array(hs, type=pa.int32()))
            .append_column("pix_sum", pa.array(sums, type=pa.int64()))
        )


def decode_images(ds, fake: bool = False,
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


class DecodeAudio:
    """Actor-pool WAV decoder (PCM16) → sample rate + sample count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, ns = [], []
        for p in batch["payload"].to_pylist():
            sr, n, _ = decode_wav(p or b"")
            srs.append(sr)
            ns.append(n)
        return (
            batch.append_column("meta_sr", pa.array(srs, type=pa.int32()))
            .append_column("meta_samples", pa.array(ns, type=pa.int64()))
        )


def decode_audio(ds, batch_size: int = 64, concurrency=(1, 8)):
    return ds.map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class FrameSample:
    """Video/audio frame sampler stub: emits every n-th 'frame index' with
    a deterministic feature hash per frame. Real video sampling requires
    av/ffmpeg (not in this environment) — the exploded output schema and
    actor plumbing are what this stage locks in."""

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
