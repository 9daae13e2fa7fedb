"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

The decode kernels are REAL: pure-numpy decoders for PPM (P6), BMP
(24-bit uncompressed), WAV (PCM16) and AVI (RIFF, uncompressed 24-bit
DIB frames) — formats simple enough to parse without codec libraries —
plus a nearest-neighbor resize. If PIL is importable it is tried first
for unknown image formats; otherwise unknown magic bytes raise
``ValueError``. Compressed video (H.264 etc.) would need av/ffmpeg (not
in this environment) and raises; the uncompressed-AVI path exercises
the full frame-sampling plumbing (binary column, small-batch actor
pool, exploded output schema) on real container bytes.

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


def _dib_rows(w: int, h: int, pixels: np.ndarray) -> bytes:
    """Flat top-down RGB raster (3*w*h uint8) → bottom-up BGR rows padded
    to 4-byte stride — the DIB layout BMP bodies and uncompressed-AVI
    frames share."""
    stride = (3 * w + 3) & ~3
    img = pixels.astype(np.uint8).reshape(h, w, 3)[:, :, ::-1]  # RGB→BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1].reshape(h, 3 * w)  # top-down → bottom-up
    return rows.tobytes()


def _dib_to_rgb(body: bytes, w: int, h: int) -> np.ndarray:
    """Inverse of ``_dib_rows``: padded bottom-up BGR bytes →
    (h, w, 3) top-down RGB array."""
    stride = (3 * w + 3) & ~3
    rows = np.frombuffer(body, dtype=np.uint8, count=stride * h).reshape(
        h, stride)
    return rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1][::-1].copy()


def encode_avi(w: int, h: int, frames: list[np.ndarray],
               fps: int = 25) -> bytes:
    """Minimal spec-correct RIFF AVI: one 'vids' stream of uncompressed
    24-bit DIB frames ('00db' chunks). Each frame is a flat top-down RGB
    raster of 3*w*h uint8 values (same convention as ``encode_ppm``)."""
    stride = (3 * w + 3) & ~3
    frame_bytes = stride * h

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    movi_body = b"movi"
    for pix in frames:
        d = _dib_rows(w, h, np.asarray(pix))
        movi_body += b"00db" + u32(len(d)) + d
        if len(d) & 1:
            movi_body += b"\x00"
    avih = (b"avih" + u32(56)
            + u32(1_000_000 // fps) + u32(frame_bytes * fps) + u32(0)
            + u32(0) + u32(len(frames)) + u32(0) + u32(1)
            + u32(frame_bytes) + u32(w) + u32(h) + u32(0) * 4)
    strh = (b"strh" + u32(56)
            + b"vids" + b"DIB " + u32(0) + u16(0) + u16(0) + u32(0)
            + u32(1) + u32(fps) + u32(0) + u32(len(frames))
            + u32(frame_bytes) + u32(0) + u32(0)
            + u16(0) + u16(0) + u16(w) + u16(h))
    strf = (b"strf" + u32(40)
            + u32(40) + u32(w) + u32(h) + u16(1) + u16(24) + u32(0)
            + u32(frame_bytes) + u32(0) + u32(0) + u32(0) + u32(0))
    strl = b"LIST" + u32(4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + u32(4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi = b"LIST" + u32(len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """RIFF AVI with uncompressed 24-bit DIB frames → (w, h, [frame])
    where each frame is a (h, w, 3) top-down RGB uint8 array. Compressed
    streams (biCompression != 0 or non-24 bpp) raise ``ValueError`` —
    real codecs need av/ffmpeg, which this environment lacks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI")
    dims: dict[str, int] = {}
    frame_chunks: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos: pos + 4]
            size = int.from_bytes(payload[pos + 4: pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"strf" and "w" not in dims:
                dims["w"] = int.from_bytes(payload[body + 4: body + 8],
                                           "little", signed=True)
                dims["h"] = int.from_bytes(payload[body + 8: body + 12],
                                           "little", signed=True)
                dims["bpp"] = int.from_bytes(payload[body + 14: body + 16],
                                             "little")
                dims["comp"] = int.from_bytes(payload[body + 16: body + 20],
                                              "little")
            elif cid in (b"00db", b"00dc"):
                frame_chunks.append(payload[body: body + size])
            pos = body + size + (size & 1)

    walk(12, 8 + int.from_bytes(payload[4:8], "little"))
    if "w" not in dims:
        raise ValueError("AVI missing strf header")
    if dims["bpp"] != 24 or dims["comp"] != 0:
        raise ValueError("only uncompressed 24-bit DIB AVI supported "
                         "(real codecs need av/ffmpeg)")
    w, h = dims["w"], abs(dims["h"])
    return w, h, [_dib_to_rgb(c, w, h) for c in frame_chunks]


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


def attach_synthetic_videos(ds, id_col: str = "doc_id"):
    """REAL AVI payloads with closed-form content: for row id d,
    n_frames = 2 + d % 5, w = 8 + d % 9, h = 8 + d % 7, and frame f's
    top-down RGB raster is pixel[i] = (11*d + 5*f + i) % 256. The SQL
    oracle recomputes (n_frames, w, h, per-frame pixel sum) from d
    alone, so the real container parser is value-checked end-to-end."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for d in ids:
            d = int(d)
            w, h, n_frames = 8 + d % 9, 8 + d % 7, 2 + d % 5
            frames = [
                (np.int64(11 * d + 5 * f)
                 + np.arange(3 * w * h, dtype=np.int64)) % 256
                for f in range(n_frames)
            ]
            payloads.append(encode_avi(w, h, frames))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["video/avi"] * len(ids), type=pa.string()),
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


class ImageFeatures:
    """Actor-pool feature extractor: decode → nearest resize → EXACT
    integer channel features (total + per-channel pixel sums). Integer
    features keep the SQL oracle bit-exact: with the synthetic
    closed-form corpus the oracle recomputes every resized pixel from
    doc_id alone (same floor-division index rule as
    ``resize_nearest``)."""

    def __init__(self, resize_to: tuple[int, int] = (16, 16)):
        self.resize_to = resize_to
        self.dec = DecodeImage(fake=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_w, out_h = self.resize_to
        pix, r, g, b = [], [], [], []
        for p in batch["payload"].to_pylist():
            _, _, img = self.dec._decode(p or b"")
            img = resize_nearest(img, out_w, out_h)
            ch = img.sum(axis=(0, 1), dtype=np.int64)
            pix.append(int(ch.sum()))
            r.append(int(ch[0]))
            g.append(int(ch[1]))
            b.append(int(ch[2]))
        n = batch.num_rows
        return (
            batch.append_column("out_w", pa.array([out_w] * n, pa.int32()))
            .append_column("out_h", pa.array([out_h] * n, pa.int32()))
            .append_column("pix_sum", pa.array(pix, pa.int64()))
            .append_column("r_sum", pa.array(r, pa.int64()))
            .append_column("g_sum", pa.array(g, pa.int64()))
            .append_column("b_sum", pa.array(b, pa.int64()))
        )


def image_features(ds, resize_to: tuple[int, int] = (16, 16),
                   batch_size: int = 64, concurrency=(1, 8)):
    """decode → resize → integer channel features as an actor-pool stage
    (small batches: payload bytes dominate block size)."""
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"resize_to": resize_to},
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
    """Video frame sampler. Real mode (``fake=False``) parses
    uncompressed-AVI payloads with :func:`decode_avi` and emits every
    n-th frame's (id, frame_idx, meta_w, meta_h, frame_sum); compressed
    codecs raise (they need av/ffmpeg). Fake mode keeps the original
    plumbing-test behavior: every n-th 64-byte slice of the payload as a
    'frame' with a deterministic feature hash."""

    def __init__(self, every_n: int = 10, fake: bool = True,
                 id_col: str = "row_key"):
        self.every_n = every_n
        self.fake = fake
        self.id_col = id_col

    def _real(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, sums = [], [], [], [], []
        id_vals = batch[self.id_col].to_pylist()
        for i, p in enumerate(batch["payload"].to_pylist()):
            w, h, frames = decode_avi(p or b"")
            for f in range(0, len(frames), self.every_n):
                ids.append(id_vals[i])
                fidx.append(f)
                ws.append(w)
                hs.append(h)
                sums.append(int(frames[f].astype(np.int64).sum()))
        return pa.table(
            {self.id_col: pa.array(ids, batch.schema.field(self.id_col).type),
             "frame_idx": pa.array(fidx, type=pa.int32()),
             "meta_w": pa.array(ws, type=pa.int32()),
             "meta_h": pa.array(hs, type=pa.int32()),
             "frame_sum": pa.array(sums, type=pa.int64())}
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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


def sample_frames(ds, every_n: int = 10, fake: bool = True,
                  id_col: str = "row_key"):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n, "fake": fake,
                               "id_col": id_col},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 8),
        num_cpus=1,
    )


def sample_video_frames(ds, every_n: int = 2, id_col: str = "doc_id"):
    """REAL frame sampling over uncompressed-AVI payloads → Dataset(id,
    frame_idx, meta_w, meta_h, frame_sum), one row per sampled frame."""
    return sample_frames(ds, every_n=every_n, fake=False, id_col=id_col)


# --- perceptual-hash image dedup --------------------------------------------


def attach_synthetic_image_variants(ds, id_col: str = "doc_id",
                                    groups: int = 40, variants: int = 7,
                                    spot_from: int | None = None):
    """REAL PPM payloads with PLANTED perceptual-duplicate structure:
    row id d belongs to image group ``g = d % groups`` with brightness
    offset ``v = (d // groups) % variants``. The image is the group's
    gradient ``base[i] = (3*g + 5*i) % 200`` shifted by ``+v`` on every
    byte (values <= 205, so no clipping), at per-group size
    ``w = 20 + g % 9``, ``h = 20 + g % 7``.

    A uniform ``+v`` on all channels moves the integer grayscale
    ``(r+g+b)//3`` by exactly ``+v`` (3v is divisible by 3), so every
    strict adjacent-pixel comparison — i.e. every dHash bit — is
    provably invariant within a group, while the ``% 200`` wrap
    positions (and the raster dimensions) differ across groups. The SQL
    oracle recomputes the whole hash from ``doc_id`` alone.

    ``spot_from=k`` additionally paints a single 255-white pixel (the
    source pixel sampled by downsample grid cell (y=3, x=4)) on
    variants with ``v >= k``: a localized perturbation that flips at
    most two dHash bits, planting NEAR-duplicates (hamming 1-2) next
    to the exact perceptual duplicates."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for d in ids:
            d = int(d)
            g, v = d % groups, (d // groups) % variants
            w, h = 20 + g % 9, 20 + g % 7
            pix = ((np.int64(3 * g)
                    + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
            if spot_from is not None and v >= spot_from:
                # white spot at the source pixel the (y=3, x=4) grid
                # cell samples: flips at most the two adjacent dHash
                # comparisons in that row — a controlled NEAR-duplicate
                # perturbation (hamming 0..2 from the clean variant)
                p0 = ((3 * h) // 8) * w + ((4 * w) // 9)
                pix[3 * p0: 3 * p0 + 3] = 255
            payloads.append(encode_ppm(w, h, pix.astype(np.uint8)))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["image/ppm"] * len(ids), type=pa.string()),
        )

    return ds.map_batches(attach, batch_format="pyarrow")


def dhash64(img: np.ndarray, hash_w: int = 8, hash_h: int = 8
            ) -> tuple[int, int]:
    """Difference hash (dHash, Krawetz's public description): integer
    grayscale ``(r+g+b)//3`` → nearest-neighbor downsample to
    ``(hash_w+1) × hash_h`` (same floor-division index rule as
    :func:`resize_nearest`) → bit(y, x) = gray[y, x+1] > gray[y, x] →
    ``hash_w * hash_h`` bits packed row-major (k = y*hash_w + x) into
    two non-negative int64 halves ``(hi = bits 32.., lo = bits 0..31)``
    so the value stays BIGINT-exact on both the Arrow and SQL sides.

    Invariant to any uniform brightness shift (strict comparisons are
    translation-invariant) — the property that makes it a perceptual
    near-duplicate key rather than a byte checksum."""
    gray = img.astype(np.int64).sum(axis=2) // 3
    h, w = gray.shape
    yi = (np.arange(hash_h) * h // hash_h).clip(0, h - 1)
    xi = (np.arange(hash_w + 1) * w // (hash_w + 1)).clip(0, w - 1)
    g = gray[yi[:, None], xi[None, :]]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()
    k = np.arange(bits.size, dtype=np.int64)
    lo = int((bits[k < 32] << k[k < 32]).sum())
    hi = int((bits[k >= 32] << (k[k >= 32] - 32)).sum())
    return hi, lo


def dhash64_stack(imgs: np.ndarray, hash_w: int = 8, hash_h: int = 8
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized :func:`dhash64` over a (n, h, w, 3) stack of SAME-SIZE
    images: one grayscale/downsample/compare pass for the whole stack
    instead of ~20 tiny numpy calls per image (per-image call overhead
    dominated the scalar path at ~100 µs/payload on 20×20 rasters).
    Bit-identical to the scalar kernel (asserted in tests)."""
    n, h, w = imgs.shape[:3]
    gray = imgs.astype(np.int64).sum(axis=3) // 3
    yi = (np.arange(hash_h) * h // hash_h).clip(0, h - 1)
    xi = (np.arange(hash_w + 1) * w // (hash_w + 1)).clip(0, w - 1)
    g = gray[:, yi[:, None], xi[None, :]]
    bits = (g[:, :, 1:] > g[:, :, :-1]).astype(np.int64).reshape(n, -1)
    half = (hash_w * hash_h) // 2
    k = np.arange(half, dtype=np.int64)
    lo = (bits[:, :half] << k).sum(axis=1)
    hi = (bits[:, half:] << k).sum(axis=1)
    return hi, lo


class ImageDHash:
    """Actor-pool perceptual hasher: decode (real codecs) → dHash,
    vectorized over same-size image stacks (sizes bucket within each
    batch; mixed-size corpora amortize per-bucket). Decoder state (PIL
    probe) is built once per actor."""

    def __init__(self, hash_w: int = 8, hash_h: int = 8):
        self.dec = DecodeImage(fake=False)
        self.hw, self.hh = hash_w, hash_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        his = np.zeros(n, dtype=np.int64)
        los = np.zeros(n, dtype=np.int64)
        buckets: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
        for i, p in enumerate(batch["payload"].to_pylist()):
            _, _, img = self.dec._decode(p or b"")
            buckets.setdefault(img.shape[:2], []).append((i, img))
        for _, members in buckets.items():
            idx = np.fromiter((i for i, _ in members), dtype=np.int64,
                              count=len(members))
            stack = np.stack([im for _, im in members])
            hi, lo = dhash64_stack(stack, self.hw, self.hh)
            his[idx] = hi
            los[idx] = lo
        return (
            batch.append_column("dhash_hi", pa.array(his, pa.int64()))
            .append_column("dhash_lo", pa.array(los, pa.int64()))
        )


def image_dhash(ds, batch_size: int = 64, concurrency=(1, 8)):
    """payload column → + (dhash_hi, dhash_lo); small batches because
    payload bytes dominate block size."""
    return ds.map_batches(
        ImageDHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_dup_groups(ds, id_col: str = "doc_id", batch_size: int = 64,
                     concurrency=(1, 8)):
    """Perceptual image dedup: dHash every payload, then cluster rows
    with IDENTICAL hashes — cluster label = min member id. Brightness
    variants of the same image land in one cluster (dHash invariance);
    byte-level checksum grouping would scatter them.

    Scale shape: reuses :func:`raydedup.stages.exact.exact_dedup` — the
    16-hex-char hash is the dedup key, so only hashes shuffle, only
    DUPLICATED hash entries broadcast for the vectorized paint, and the
    distributed grouped-aggregate path engages automatically above the
    driver threshold. Row keys are zero-padded ids so the string min
    exact_dedup computes equals the numeric min the oracle computes."""
    import pyarrow.compute as pc

    from raydedup.stages.exact import exact_dedup

    hashed = image_dhash(ds, batch_size=batch_size, concurrency=concurrency)

    def key(b: pa.Table) -> pa.Table:
        # skinny projection: the binary payload must NOT flow into the
        # dedup shuffle/materialize — hashes only past this point
        hi = b["dhash_hi"].to_numpy(zero_copy_only=False)
        lo = b["dhash_lo"].to_numpy(zero_copy_only=False)
        sha = [f"{a:08x}{c:08x}" for a, c in zip(hi, lo)]
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "dhash_hi": b["dhash_hi"],
            "dhash_lo": b["dhash_lo"],
            "text_sha256": pa.array(sha, pa.string()),
            "row_key": pa.array(rk, pa.string()),
        })

    assigned = exact_dedup(hashed.map_batches(key, batch_format="pyarrow"))

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "dhash_hi": b["dhash_hi"],
            "dhash_lo": b["dhash_lo"],
            "img_cluster": pc.cast(b["rep_key"], pa.int64()),
            "n_members": pc.cast(b["n_exact"], pa.int64()),
        })

    return assigned.map_batches(out, batch_format="pyarrow")


def image_near_dup_pairs(ds, id_col: str = "doc_id", hamming_max: int = 6,
                         batch_size: int = 64, concurrency=(1, 8)):
    """Perceptual image NEAR-dup pairs: dHash every payload, keep one
    representative per DISTINCT hash (min id — identical-hash rows are
    the exact tier, handled by :func:`image_dup_groups`), then find all
    representative pairs with hamming(dHash) <= ``hamming_max`` via the
    EXACT pigeonhole block search (``stages/simhash_near.py`` — split
    64 bits into h+1 blocks, group by block value, verify in-bucket).

    Scale shape: hashes-only shuffle, identical-hash collapse BEFORE the
    low-entropy block grouping (the documented precondition of the
    pigeonhole stage), vectorized in-bucket hamming. Output
    ``(a_id < b_id, hamming)``, one row per pair."""
    import pyarrow.compute as pc

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.exact import exact_dedup
    from raydedup.stages.simhash_near import simhash_near_pairs

    hashed = image_dhash(ds, batch_size=batch_size, concurrency=concurrency)

    def key(b: pa.Table) -> pa.Table:
        hi = b["dhash_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = b["dhash_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        combined = ((hi << np.uint64(32)) | lo).view(np.int64)
        sha = [f"{a:08x}{c:08x}" for a, c in zip(hi, lo)]
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            "row_key": pa.array(rk, pa.string()),
            "text_sha256": pa.array(sha, pa.string()),
            "simhash": pa.array(combined, pa.int64()),
        })

    assigned = exact_dedup(hashed.map_batches(key, batch_format="pyarrow"))

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(b["is_rep"].combine_chunks()).select(
            ["row_key", "simhash"])

    reps = assigned.map_batches(reps_only, batch_format="pyarrow")
    cfg = DEFAULT_CONFIG.with_overrides(simhash_dup_hamming=hamming_max)
    pairs = simhash_near_pairs(reps, cfg)

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            "a_id": pc.cast(b["a_key"], pa.int64()),
            "b_id": pc.cast(b["b_key"], pa.int64()),
            "hamming": pc.cast(b["hamming"], pa.int32()),
        })

    return pairs.map_batches(out, batch_format="pyarrow")


# --- fingerprint audio dedup ------------------------------------------------


def attach_synthetic_audio_variants(ds, id_col: str = "doc_id",
                                    groups: int = 40, variants: int = 7,
                                    frame_len: int = 64, n_frames: int = 33,
                                    spike_from: int | None = None):
    """REAL WAV payloads with PLANTED perceptual-duplicate structure:
    row id d belongs to audio group ``g = d % groups`` whose base
    waveform is ``base[t] = ((13g + (3 + g%11)·t) % (1024 + 37g))
    - (1024 + 37g)//2`` — a group-specific sawtooth whose wrap pattern
    (and hence frame-energy profile) differs per group. Variant
    ``v = (d // groups) % variants`` scales amplitude by ``(1+v)``
    (max |sample| < 2467·7/2 < 32768, no clipping): a VOLUME change,
    which multiplies every frame energy by the same positive factor and
    therefore leaves every energy comparison — every fingerprint bit —
    provably invariant within a group. The SQL oracle replays the
    samples closed-form from doc_id alone.

    ``spike_from=k`` additionally DOUBLES the amplitude of one frame
    (index ``1 + g % (n_frames - 2)``) on variants with ``v >= k``: a
    localized loudness burst that flips at most the two adjacent
    energy-delta comparisons, planting NEAR-duplicates (hamming 0..2)
    next to the exact perceptual duplicates (max |sample| then
    < 2467·7 < 32768 — still no clipping)."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        t = np.arange(frame_len * n_frames, dtype=np.int64)
        payloads = []
        for d in ids:
            d = int(d)
            g, v = d % groups, (d // groups) % variants
            step, mod = 3 + g % 11, 1024 + 37 * g
            s = (((13 * g + step * t) % mod) - mod // 2) * (1 + v)
            if spike_from is not None and v >= spike_from:
                k = 1 + g % (n_frames - 2)
                s[k * frame_len: (k + 1) * frame_len] *= 2
            payloads.append(encode_wav(8000, s.astype(np.int16)))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["audio/wav"] * len(ids), type=pa.string()),
        )

    return ds.map_batches(attach, batch_format="pyarrow")


def audio_fingerprint64(samples: np.ndarray, frame_len: int = 64) -> int:
    """Sign-of-energy-delta fingerprint (the 1-D analogue of dHash,
    Haitsma-Kalker-style energy-difference bits): frame energy
    ``E_f = Σ |s|`` over consecutive ``frame_len``-sample frames,
    bit f = ``E_{f+1} > E_f``, packed LSB-first. Invariant to any
    positive amplitude scaling — the property that makes it a
    perceptual key for volume-variant duplicates rather than a byte
    checksum. Up to 63 frames of comparisons fit the BIGINT contract."""
    n = (samples.size // frame_len) * frame_len
    e = np.abs(samples[:n].astype(np.int64)).reshape(-1, frame_len).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    return int((bits << np.arange(bits.size, dtype=np.int64)).sum())


def audio_fingerprint64_stack(samples: np.ndarray,
                              frame_len: int = 64) -> np.ndarray:
    """Vectorized :func:`audio_fingerprint64` over a (n, t) stack of
    SAME-LENGTH clips — one abs/reshape/sum/compare pass for the stack.
    Bit-identical to the scalar kernel (asserted in tests)."""
    n, t = samples.shape
    nf = t // frame_len
    e = np.abs(samples[:, : nf * frame_len].astype(np.int64)).reshape(
        n, nf, frame_len).sum(axis=2)
    bits = (e[:, 1:] > e[:, :-1]).astype(np.int64)
    k = np.arange(bits.shape[1], dtype=np.int64)
    return (bits << k).sum(axis=1)


class AudioFingerprint:
    """Actor-pool audio fingerprinter: real WAV decode → energy-delta
    fingerprint column ``afp``, vectorized over same-length clip stacks
    (lengths bucket within each batch)."""

    def __init__(self, frame_len: int = 64):
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fps = np.zeros(n, dtype=np.int64)
        buckets: dict[int, list[tuple[int, np.ndarray]]] = {}
        for i, p in enumerate(batch["payload"].to_pylist()):
            _, _, samples = decode_wav(p or b"")
            buckets.setdefault(samples.size, []).append((i, samples))
        for _, members in buckets.items():
            idx = np.fromiter((i for i, _ in members), dtype=np.int64,
                              count=len(members))
            stack = np.stack([s for _, s in members])
            fps[idx] = audio_fingerprint64_stack(stack, self.frame_len)
        return batch.append_column("afp", pa.array(fps, pa.int64()))


def audio_dup_groups(ds, id_col: str = "doc_id", frame_len: int = 64,
                     batch_size: int = 64, concurrency=(1, 8)):
    """Perceptual audio dedup: fingerprint every payload, cluster rows
    with IDENTICAL fingerprints (label = min member id) — volume
    variants of one recording share a cluster. Same scale shape as
    :func:`image_dup_groups`: exact_dedup on the hex fingerprint, only
    hashes shuffle, duplicated entries broadcast for the paint."""
    import pyarrow.compute as pc

    from raydedup.stages.exact import exact_dedup

    fped = ds.map_batches(
        AudioFingerprint,
        fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def key(b: pa.Table) -> pa.Table:
        # skinny projection: drop the payload before the dedup shuffle
        sha = [f"{int(a):016x}" for a in b["afp"].to_pylist()]
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "afp": b["afp"],
            "text_sha256": pa.array(sha, pa.string()),
            "row_key": pa.array(rk, pa.string()),
        })

    assigned = exact_dedup(fped.map_batches(key, batch_format="pyarrow"))

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "afp": b["afp"],
            "audio_cluster": pc.cast(b["rep_key"], pa.int64()),
            "n_members": pc.cast(b["n_exact"], pa.int64()),
        })

    return assigned.map_batches(out, batch_format="pyarrow")


def _audio_rep_keys(ds, id_col: str, frame_len: int, batch_size: int,
                    concurrency):
    """Shared front half of the audio NEAR tier: fingerprint payloads,
    collapse identical fingerprints through exact_dedup (hex key — only
    hashes shuffle, payloads are dropped at the key projection), and
    return the assigned Dataset whose ``is_rep`` rows carry the int64
    fingerprint in the pigeonhole stage's ``simhash`` column."""
    from raydedup.stages.exact import exact_dedup

    fped = ds.map_batches(
        AudioFingerprint,
        fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def key(b: pa.Table) -> pa.Table:
        sha = [f"{int(a):016x}" for a in b["afp"].to_pylist()]
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "row_key": pa.array(rk, pa.string()),
            "text_sha256": pa.array(sha, pa.string()),
            "simhash": b["afp"],
        })

    return exact_dedup(fped.map_batches(key, batch_format="pyarrow"))


def audio_near_dup_pairs(ds, id_col: str = "doc_id", hamming_max: int = 4,
                         frame_len: int = 64, batch_size: int = 64,
                         concurrency=(1, 8)):
    """Perceptual audio NEAR-dup pairs: energy-delta fingerprint every
    payload, keep one representative per DISTINCT fingerprint (min id —
    identical fingerprints are the exact tier,
    :func:`audio_dup_groups`), then find all representative pairs with
    hamming(fingerprint) <= ``hamming_max`` via the EXACT pigeonhole
    block search (``stages/simhash_near.py``) — the audio analogue of
    :func:`image_near_dup_pairs`, catching clips that differ by a
    localized loudness change (1-2 flipped comparison bits) rather
    than a global volume shift (0 flipped bits).

    Scale shape: hashes-only shuffle, identical-fingerprint collapse
    BEFORE the block grouping (the documented pigeonhole precondition),
    vectorized in-bucket hamming. Output ``(a_id < b_id, hamming)``."""
    import pyarrow.compute as pc

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.simhash_near import simhash_near_pairs

    assigned = _audio_rep_keys(ds, id_col, frame_len, batch_size,
                               concurrency)

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(b["is_rep"].combine_chunks()).select(
            ["row_key", "simhash"])

    reps = assigned.map_batches(reps_only, batch_format="pyarrow")
    cfg = DEFAULT_CONFIG.with_overrides(simhash_dup_hamming=hamming_max)
    pairs = simhash_near_pairs(reps, cfg)

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            "a_id": pc.cast(b["a_key"], pa.int64()),
            "b_id": pc.cast(b["b_key"], pa.int64()),
            "hamming": pc.cast(b["hamming"], pa.int32()),
        })

    return pairs.map_batches(out, batch_format="pyarrow")


def audio_near_dup_clusters(ds, id_col: str = "doc_id",
                            hamming_max: int = 4, frame_len: int = 64,
                            driver_max_edges: int = 5_000_000,
                            batch_size: int = 64, concurrency=(1, 8)):
    """Unified perceptual audio CLUSTERING: exact tier (identical
    fingerprint → one representative, min id) ∪ near tier (hamming <= h
    pairs among representatives) → connected components → every row
    labeled with the min doc_id of its component — the audio analogue
    of :func:`image_near_dup_clusters`, same driver/distributed
    component auto-switch at ``driver_max_edges``."""
    import ray
    import pyarrow.compute as pc

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.simhash_near import simhash_near_pairs
    from raydedup.state.unionfind import (
        connected_components_distributed,
        connected_components_driver,
    )

    assigned = _audio_rep_keys(ds, id_col, frame_len, batch_size,
                               concurrency).materialize()

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(b["is_rep"].combine_chunks()).select(
            ["row_key", "simhash"])

    reps = assigned.map_batches(reps_only, batch_format="pyarrow")
    cfg = DEFAULT_CONFIG.with_overrides(simhash_dup_hamming=hamming_max)
    pairs = simhash_near_pairs(reps, cfg).materialize()

    if pairs.count() > driver_max_edges:
        lab = connected_components_distributed(pairs)
        tbls = list(lab.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        lt = pa.concat_tables(tbls) if tbls else pa.table(
            {"node": pa.array([], pa.string()),
             "label": pa.array([], pa.string())})
        keys_arr = lt["node"].combine_chunks()
        vals_arr = lt["label"].combine_chunks()
    else:
        comp = connected_components_driver(pairs)
        keys_arr = pa.array(list(comp.keys()), pa.string())
        vals_arr = pa.array(list(comp.values()), pa.string())
    ref = ray.put((keys_arr, vals_arr))

    def paint(b: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        at = pc.index_in(b["rep_key"], value_set=k)
        lab_ = pc.coalesce(pc.take(v, at), b["rep_key"])
        return pa.table({
            id_col: b[id_col],
            "audio_cluster": pc.cast(lab_, pa.int64()),
        })

    return assigned.map_batches(paint, batch_format="pyarrow")


def attach_synthetic_audio_trims(ds, id_col: str = "doc_id",
                                 groups: int = 40, variants: int = 7,
                                 frame_len: int = 64, n_frames: int = 64):
    """REAL WAV payloads with PLANTED trim+volume duplicate structure —
    the fixture for the TIME-SHIFT-robust audio tier: row id d belongs
    to audio group ``g = d % groups`` whose base clip holds one CONSTANT
    level per frame, drawn from an AVALANCHE hash of the absolute frame
    id ``x = 64·g + f``::

        h = (x · 2654435761) mod 2^31
        h = ((h xor (h >> 15)) · 2246822519) mod 2^31
        level(g, f) = (h xor (h >> 13)) mod 4000

    so the frame-energy profile (hence the delta-bit stream) is
    effectively random per group — a LINEAR frame hash makes every
    group a modular time-shift of one global orbit, which a
    shift-robust detector then (correctly!) matches across groups;
    measured separation with this form: in-group window-set Jaccard
    >= 0.86, cross-group <= 0.14. Variant ``v = (d // groups) %
    variants`` cuts the first ``v`` FRAMES off the clip (a frame-aligned
    re-trim, the audio analogue of a re-cut video dropping leading
    frames) AND scales amplitude by ``(1+v)`` (max sample 3999·7 =
    27993 < 32768, no clipping) — a detector must be invariant to BOTH
    a volume change and a time shift to group them. The SQL oracle
    replays every sample closed-form from doc_id."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for d in ids:
            d = int(d)
            g, v = d % groups, (d // groups) % variants
            x = np.arange(v, n_frames, dtype=np.int64) + n_frames * g
            h = (x * 2654435761) % (1 << 31)
            h = ((h ^ (h >> 15)) * 2246822519) % (1 << 31)
            lvl = ((h ^ (h >> 13)) % 4000) * (1 + v)
            s = np.repeat(lvl, frame_len)
            payloads.append(encode_wav(8000, s.astype(np.int16)))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["audio/wav"] * len(ids), type=pa.string()),
        )

    return ds.map_batches(attach, batch_format="pyarrow")


def audio_window_fingerprints(samples: np.ndarray, frame_len: int = 64,
                              window_bits: int = 16
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Constellation-style shift-robust fingerprinting (the pure-numpy
    landmark idea behind Wang 2003's constellation hashing, applied to
    the energy-delta domain): the clip reduces to its energy-delta BIT
    STREAM ``b_f = (E_{f+1} > E_f)`` (volume-invariant), and every
    ``window_bits``-long run of consecutive bits packs into one word —
    the clip's SET of overlapping window words. A frame-aligned trim of
    k frames removes exactly k leading (or trailing) bits, so ALL
    interior windows survive: trimmed clips share (W-k)/W of their
    windows and cluster under set-Jaccard, where single-fingerprint
    hamming (``audio_near_dup_pairs``) sees a completely misaligned bit
    string. Returns (sorted distinct window words uint64, bit stream)."""
    n = (samples.size // frame_len) * frame_len
    e = np.abs(samples[:n].astype(np.int64)).reshape(
        -1, frame_len).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    w = bits.size - window_bits + 1
    if w <= 0:
        return np.empty(0, np.uint64), bits
    win = np.zeros(w, dtype=np.uint64)
    for j in range(window_bits):
        win |= bits[j: j + w] << np.uint64(j)
    return np.unique(win), bits


class AudioWindowFingerprint:
    """Actor-pool shift-robust audio fingerprinter: real WAV decode →
    delta-bit stream + overlapping-window word set. Emits the exact
    collapse key (packed bit stream + length — identical streams are
    volume variants of one cut) and the packed window set for the
    set-similarity join."""

    def __init__(self, frame_len: int = 64, window_bits: int = 16):
        self.frame_len = frame_len
        self.window_bits = window_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, wsets = [], []
        for p in batch["payload"].to_pylist():
            _, _, samples = decode_wav(p or b"")
            wins, bits = audio_window_fingerprints(
                samples, self.frame_len, self.window_bits)
            keys.append(
                f"{np.packbits(bits.astype(np.uint8)).tobytes().hex()}"
                f":{bits.size}")
            wsets.append(wins.astype(">u8").tobytes())
        return batch.append_column(
            "sbit", pa.array(keys, pa.string())
        ).append_column("whb", pa.array(wsets, pa.binary()))


def audio_shift_near_dup_pairs(ds, threshold: float = 0.6,
                               id_col: str = "doc_id",
                               frame_len: int = 64, window_bits: int = 16,
                               batch_size: int = 64, concurrency=(1, 8)):
    """TIME-SHIFT-robust audio near-dup pairs: representative pairs
    whose overlapping delta-bit WINDOW SETS overlap with Jaccard >=
    ``threshold`` — the structure the single-fingerprint hamming tier
    (:func:`audio_near_dup_pairs`) provably cannot catch: a re-trimmed
    clip shifts every energy-delta bit position, scrambling the packed
    64-bit fingerprint, while its interior window WORDS are untouched
    (:func:`audio_window_fingerprints`). The audio twin of
    :func:`video_near_dup_pairs`'s frame-set re-cut detection.

    Scale shape: window words ride as packed binary through the
    bit-stream exact_dedup collapse (one representative per distinct
    cut — volume variants collapse first), then the representatives'
    window sets go through the EXACT prefix-filter AllPairs join
    (``stages/setjoin.set_similarity_join_sets``); payload bytes never
    cross a shuffle. Output ``(a_id < b_id, common, na, nb, jaccard)``
    over representative ids, exact by construction."""
    from raydedup.stages.exact import exact_dedup
    from raydedup.stages.setjoin import set_similarity_join_sets

    fped = ds.map_batches(
        AudioWindowFingerprint,
        fn_constructor_kwargs={"frame_len": frame_len,
                               "window_bits": window_bits},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def key(b: pa.Table) -> pa.Table:
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "row_key": pa.array(rk, pa.string()),
            "text_sha256": b["sbit"],
            "whb": b["whb"],
        })

    assigned = exact_dedup(fped.map_batches(key, batch_format="pyarrow"))

    def rep_sets(b: pa.Table) -> pa.Table:
        sets_schema = pa.schema([pa.field(id_col, pa.int64()),
                                 pa.field("nsh", pa.int64()),
                                 pa.field("sh", pa.list_(pa.uint64()))])
        b = b.filter(b["is_rep"].combine_chunks())
        if b.num_rows == 0:
            return sets_schema.empty_table()
        ids, nshs, offs, vals = [], [], [0], []
        for d, raw in zip(b[id_col].to_pylist(), b["whb"].to_pylist()):
            u = np.frombuffer(raw or b"", dtype=">u8").astype(np.uint64)
            if u.size == 0:
                continue
            ids.append(int(d))
            nshs.append(int(u.size))
            vals.append(u)
            offs.append(offs[-1] + u.size)
        if not ids:
            return sets_schema.empty_table()
        flat = np.concatenate(vals)
        sh = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(flat, type=pa.uint64()))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "nsh": pa.array(nshs, pa.int64()),
                         "sh": sh})

    sets = assigned.map_batches(rep_sets, batch_format="pyarrow")
    return set_similarity_join_sets(sets, threshold, id_col=id_col,
                                    id_type=pa.int64())


# --- perceptual video dedup -------------------------------------------------


def attach_synthetic_video_variants(ds, id_col: str = "doc_id",
                                    groups: int = 40, variants: int = 7,
                                    recut_from: int | None = None):
    """REAL AVI payloads with PLANTED perceptual-duplicate structure:
    row id d belongs to video group ``g = d % groups`` (frame raster
    ``pixel[i] = (7g + 11f + 5i) % 200`` for frame f, size
    ``w = 16 + g%9, h = 16 + g%7``, ``2 + g%3`` frames) with brightness
    offset ``v = (d // groups) % variants`` added to every byte
    (<= 206, no clipping). As with the image corpus, a uniform ``+v``
    shifts every frame's integer grayscale uniformly, so every
    per-frame dHash bit is provably invariant within a group; the SQL
    oracle replays all frame hashes closed-form from doc_id.

    ``recut_from=k`` plants RE-CUT variants: ``v == k`` REVERSES the
    frame order (same frame set — ordered-key distinct, set-Jaccard
    1.0 vs the clean cut) and ``v > k`` DROPS the last frame
    (set-Jaccard (nf-1)/nf ∈ {1/2, 2/3, 3/4}) — the structure
    :func:`video_near_dup_pairs` is built to catch and an ordered-key
    dedup provably cannot."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for d in ids:
            d = int(d)
            g, v = d % groups, (d // groups) % variants
            w, h, n_frames = 16 + g % 9, 16 + g % 7, 2 + g % 3
            frames = [
                ((np.int64(7 * g + 11 * f)
                  + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
                for f in range(n_frames)
            ]
            if recut_from is not None and v == recut_from:
                frames = frames[::-1]
            elif recut_from is not None and v > recut_from:
                frames = frames[:-1]
            payloads.append(encode_avi(w, h, frames))
        return batch.append_column(
            "payload", pa.array(payloads, type=pa.binary())
        ).append_column(
            "media_type",
            pa.array(["video/avi"] * len(ids), type=pa.string()),
        )

    return ds.map_batches(attach, batch_format="pyarrow")


class VideoDHash:
    """Actor-pool perceptual video hasher: real RIFF/AVI walk → per-frame
    dHash → order-preserving joined key ``hi:lo;hi:lo;...`` (decimal,
    dialect-safe for the SQL twin's string_agg), plus the same hashes
    as a packed big-endian uint64 binary column ``fhb`` (frame order,
    ``(hi << 32) | lo`` per frame) — binary packing because list
    columns cannot ride an Acero groupby/join while binary payloads
    can (the setjoin ``_pack_u64_lists`` idiom)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        # collect every frame across the batch, hash per same-size
        # stack (one vectorized pass per size bucket), then reassemble
        # the ordered per-payload key
        per_doc: list[list[str]] = []
        per_doc_u64: list[np.ndarray] = []
        buckets: dict[tuple[int, int],
                      list[tuple[int, int, np.ndarray]]] = {}
        for i, p in enumerate(batch["payload"].to_pylist()):
            _, _, frames = decode_avi(p or b"")
            per_doc.append([""] * len(frames))
            per_doc_u64.append(np.zeros(len(frames), dtype=np.uint64))
            for f, fr in enumerate(frames):
                buckets.setdefault(fr.shape[:2], []).append((i, f, fr))
        for _, members in buckets.items():
            stack = np.stack([fr for _, _, fr in members])
            hi, lo = dhash64_stack(stack)
            for j, (i, f, _) in enumerate(members):
                per_doc[i][f] = f"{hi[j]}:{lo[j]}"
                per_doc_u64[i][f] = ((np.uint64(hi[j]) << np.uint64(32))
                                     | np.uint64(lo[j]))
        keys = [";".join(parts) for parts in per_doc]
        packed = [a.astype(">u8").tobytes() for a in per_doc_u64]
        return batch.append_column(
            "vhash", pa.array(keys, pa.string())
        ).append_column("fhb", pa.array(packed, pa.binary()))


def video_dup_groups(ds, id_col: str = "doc_id", batch_size: int = 32,
                     concurrency=(1, 8)):
    """Perceptual video dedup: per-frame dHash sequence as the identity
    key (frame ORDER matters — reversed or re-cut videos do not
    collapse), clustered through exact_dedup exactly like the image and
    audio tiers. Brightness variants of one clip share a cluster."""
    import pyarrow.compute as pc

    from raydedup.stages.exact import exact_dedup

    hashed = ds.map_batches(
        VideoDHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def key(b: pa.Table) -> pa.Table:
        # skinny projection: drop the payload before the dedup shuffle
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "vhash": b["vhash"],
            "text_sha256": b["vhash"],
            "row_key": pa.array(rk, pa.string()),
        })

    assigned = exact_dedup(hashed.map_batches(key, batch_format="pyarrow"))

    def out(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "vhash": b["vhash"],
            "video_cluster": pc.cast(b["rep_key"], pa.int64()),
            "n_members": pc.cast(b["n_exact"], pa.int64()),
        })

    return assigned.map_batches(out, batch_format="pyarrow")


def video_near_dup_pairs(ds, threshold: float = 0.5,
                         id_col: str = "doc_id", batch_size: int = 32,
                         concurrency=(1, 8)):
    """RE-CUT video detection: representative pairs whose distinct
    per-frame dHash SETS overlap with Jaccard >= ``threshold`` — the
    structure the ordered-key exact tier (:func:`video_dup_groups`)
    provably cannot catch: a reversed clip (same frames, set-Jaccard
    1.0) or a trimmed clip (one frame dropped, (nf-1)/nf) has a
    different ordered key but a near-identical frame set.

    Scale shape: per-frame hashes ride as packed binary through the
    ordered-key exact_dedup collapse (one representative per distinct
    CUT), then the representatives' frame-hash sets go through the
    EXACT prefix-filter AllPairs join
    (``stages/setjoin.set_similarity_join_sets`` — hot-last ordering,
    singleton-bucket semi-join, tiled verify); payload bytes never
    cross a shuffle. Output ``(a_id < b_id, common, na, nb, jaccard)``
    over representative doc_ids, exact by construction."""
    from raydedup.stages.exact import exact_dedup
    from raydedup.stages.setjoin import set_similarity_join_sets

    hashed = ds.map_batches(
        VideoDHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def key(b: pa.Table) -> pa.Table:
        # skinny projection: ordered key + packed frame hashes only
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "row_key": pa.array(rk, pa.string()),
            "text_sha256": b["vhash"],
            "fhb": b["fhb"],
        })

    assigned = exact_dedup(hashed.map_batches(key, batch_format="pyarrow"))

    def rep_sets(b: pa.Table) -> pa.Table:
        sets_schema = pa.schema([pa.field(id_col, pa.int64()),
                                 pa.field("nsh", pa.int64()),
                                 pa.field("sh", pa.list_(pa.uint64()))])
        b = b.filter(b["is_rep"].combine_chunks())
        if b.num_rows == 0:
            return sets_schema.empty_table()
        ids, nshs, offs, vals = [], [], [0], []
        for d, raw in zip(b[id_col].to_pylist(), b["fhb"].to_pylist()):
            u = np.unique(np.frombuffer(raw or b"", dtype=">u8")
                          .astype(np.uint64))
            if u.size == 0:
                continue
            ids.append(int(d))
            nshs.append(int(u.size))
            vals.append(u)
            offs.append(offs[-1] + u.size)
        if not ids:
            return sets_schema.empty_table()
        flat = np.concatenate(vals)
        sh = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(flat, type=pa.uint64()))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "nsh": pa.array(nshs, pa.int64()),
                         "sh": sh})

    sets = assigned.map_batches(rep_sets, batch_format="pyarrow")
    return set_similarity_join_sets(sets, threshold, id_col=id_col,
                                    id_type=pa.int64())


def image_near_dup_clusters(ds, id_col: str = "doc_id",
                            hamming_max: int = 6,
                            driver_max_edges: int = 5_000_000,
                            batch_size: int = 64, concurrency=(1, 8)):
    """Unified perceptual image CLUSTERING: exact tier (identical dHash
    → one representative per hash, min id) ∪ near tier (hamming <= h
    pairs among representatives via the exact pigeonhole search) →
    connected components → every row labeled with the min doc_id of its
    component. The image analogue of the flagship text cascade
    (exact dedup → LSH pairs → union-find).

    Scale shape: hashes-only shuffles throughout; components run on the
    driver below ``driver_max_edges`` verified pairs and switch to the
    distributed min-label propagation above it (the exact.py/lsh.py
    auto-switch idiom). The broadcast label map covers only PAIRED
    representatives — near-pairs between DISTINCT perceptual hashes are
    sparse, the same bound the text union-find documents."""
    import ray
    import pyarrow.compute as pc

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.exact import exact_dedup
    from raydedup.stages.simhash_near import simhash_near_pairs
    from raydedup.state.unionfind import (
        connected_components_distributed,
        connected_components_driver,
    )

    hashed = image_dhash(ds, batch_size=batch_size, concurrency=concurrency)

    def key(b: pa.Table) -> pa.Table:
        hi = b["dhash_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = b["dhash_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        combined = ((hi << np.uint64(32)) | lo).view(np.int64)
        sha = [f"{a:08x}{c:08x}" for a, c in zip(hi, lo)]
        rk = [f"{int(d):020d}" for d in b[id_col].to_pylist()]
        return pa.table({
            id_col: b[id_col],
            "row_key": pa.array(rk, pa.string()),
            "text_sha256": pa.array(sha, pa.string()),
            "simhash": pa.array(combined, pa.int64()),
        })

    assigned = exact_dedup(
        hashed.map_batches(key, batch_format="pyarrow")).materialize()

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(b["is_rep"].combine_chunks()).select(
            ["row_key", "simhash"])

    reps = assigned.map_batches(reps_only, batch_format="pyarrow")
    cfg = DEFAULT_CONFIG.with_overrides(simhash_dup_hamming=hamming_max)
    pairs = simhash_near_pairs(reps, cfg).materialize()

    if pairs.count() > driver_max_edges:
        lab = connected_components_distributed(pairs)
        tbls = list(lab.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        lt = pa.concat_tables(tbls) if tbls else pa.table(
            {"node": pa.array([], pa.string()),
             "label": pa.array([], pa.string())})
        keys_arr = lt["node"].combine_chunks()
        vals_arr = lt["label"].combine_chunks()
    else:
        comp = connected_components_driver(pairs)
        keys_arr = pa.array(list(comp.keys()), pa.string())
        vals_arr = pa.array(list(comp.values()), pa.string())
    ref = ray.put((keys_arr, vals_arr))

    def paint(b: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        at = pc.index_in(b["rep_key"], value_set=k)
        lab_ = pc.coalesce(pc.take(v, at), b["rep_key"])
        return pa.table({
            id_col: b[id_col],
            "img_cluster": pc.cast(lab_, pa.int64()),
        })

    return assigned.map_batches(paint, batch_format="pyarrow")
