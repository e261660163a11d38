"""Multimodal column plumbing — decode / feature-extract as actor-pool
stages over opaque ``binary`` columns with typed metadata.

Real decoders for the formats Python's stdlib can decode byte-wise with no
third-party codecs: WAV (``wave``), uncompressed 24-bit BMP (header parse
+ numpy) and non-interlaced 8-bit RGB PNG (``zlib`` inflate + scanline
unfilter, all five spec filters).  Payloads the decoder does not recognize
fall back to the clearly marked :class:`FakeDecoder` (deterministic
md5-derived features) — swap that tier for a PIL/libav-backed decoder on
a real cluster.
Everything Ray-side — schema, small batch sizes for wide binary rows,
actor signature (codec state built once per actor in ``__init__``),
output layout — is real and tested.

The synthetic media table (:func:`to_binary_batch`) assigns each document
one of three media types by ``doc_id % 3`` and SYNTHESIZES real bytes for
the first two; decoded features are closed-form functions of ``doc_id``
(documented per synth function), which is what lets the DuckDB oracle
verify that decode exactly inverts encode.  Features are reported as
EXACT integers (2 × channel/amplitude mean is always integral for these
payloads) so engine/oracle comparison never hits float-rounding ties.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8
# Wide binary rows: keep batches small so batch × concurrency fits the heap.
DECODE_BATCH_SIZE = 64

MEDIA_BMP = "image/bmp"
MEDIA_WAV = "audio/wav"
MEDIA_PNG = "image/png"
MEDIA_FAKE = "application/octet-stream"

WAV_RATE = 8000

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------- synthesis

def synth_bmp(doc_id: int) -> bytes:
    """Deterministic uncompressed 24-bit bottom-up BMP.

    width  = 4 + doc_id % 13      (hits widths not divisible by 4, so the
    height = 3 + (doc_id // 7) % 11   row-padding path is exercised)
    channel value at (x, y) = base_c + x + y  (never wraps: base < 128,
    x + y < 27), with base_r = doc_id % 128, base_g = (3·doc_id) % 128,
    base_b = (7·doc_id) % 128.  Therefore
    2·mean(channel c) = 2·base_c + width + height - 2 — the closed form
    the oracle checks against the engine's byte-level decode."""
    w = 4 + doc_id % 13
    h = 3 + (doc_id // 7) % 11
    bases = (doc_id % 128, (3 * doc_id) % 128, (7 * doc_id) % 128)  # r,g,b
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    grad = x + y
    stride = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, stride), dtype=np.uint8)
    # pixel order in the file is B, G, R
    img[:, 0:w * 3:3] = (bases[2] + grad).astype(np.uint8)
    img[:, 1:w * 3:3] = (bases[1] + grad).astype(np.uint8)
    img[:, 2:w * 3:3] = (bases[0] + grad).astype(np.uint8)
    pixel_data = img[::-1].tobytes()          # bottom-up row order
    file_size = 54 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def synth_wav(doc_id: int) -> bytes:
    """Deterministic 16-bit PCM mono WAV at 8000 Hz.

    n_frames = 64 + doc_id % 128; sample[i] = base + i with
    base = doc_id % 256 (max < 640, well inside int16).  Therefore
    2·mean = 2·base + n - 1 and max = base + n - 1 — the closed forms
    the oracle checks against the engine's ``wave`` decode."""
    base = doc_id % 256
    n = 64 + doc_id % 128
    samples = (base + np.arange(n, dtype=np.int64)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(WAV_RATE)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def synth_png(doc_id: int) -> bytes:
    """Deterministic non-interlaced 8-bit RGB (color type 2) PNG.

    width  = 5 + doc_id % 11
    height = 3 + (doc_id // 5) % 9
    channel value at (x, y) = base_c + x + y  (never wraps: base < 100,
    x + y ≤ 25), with base_r = doc_id % 100, base_g = (5·doc_id) % 100,
    base_b = (11·doc_id) % 100.  Therefore
    2·mean(channel c) = 2·base_c + width + height − 2 — the closed form
    the oracle checks against the engine's byte-level decode.

    Scanline filters CYCLE through None/Sub/Up (row % 3), so the
    decoder's unfilter paths are genuinely exercised — a decoder that
    ignored filtering would fail the oracle on every height ≥ 2 image."""
    w = 5 + doc_id % 11
    h = 3 + (doc_id // 5) % 9
    bases = (doc_id % 100, (5 * doc_id) % 100, (11 * doc_id) % 100)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    grad = x + y
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for c in range(3):
        img[:, :, c] = (bases[c] + grad).astype(np.uint8)
    raw = img.reshape(h, w * 3)
    lines = bytearray()
    for r in range(h):
        f = r % 3
        row = raw[r].astype(np.int16)
        if f == 1:                          # Sub: minus left pixel (bpp=3)
            row = row - np.concatenate([np.zeros(3, np.int16), row[:-3]])
        elif f == 2 and r > 0:              # Up: minus previous row
            row = row - raw[r - 1].astype(np.int16)
        lines.append(f)                     # Up at r=0: prior row is zeros
        lines.extend((row % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b""))


def to_binary_batch(t: pa.Table) -> pa.Table:
    """documents → typed binary media rows (media-table stand-in):
    doc_id % 4 == 0 → real BMP bytes, == 1 → real WAV bytes,
    == 2 → real PNG bytes, == 3 → opaque payload (the doc text's utf-8
    bytes)."""
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    payloads, types = [], []
    for d, x in zip(doc_ids, texts):
        m = int(d) % 4
        if m == 0:
            payloads.append(synth_bmp(int(d)))
            types.append(MEDIA_BMP)
        elif m == 1:
            payloads.append(synth_wav(int(d)))
            types.append(MEDIA_WAV)
        elif m == 2:
            payloads.append(synth_png(int(d)))
            types.append(MEDIA_PNG)
        else:
            payloads.append(x.encode("utf-8"))
            types.append(MEDIA_FAKE)
    return pa.table({"doc_id": t["doc_id"],
                     "payload": pa.array(payloads, pa.binary()),
                     "media_type": pa.array(types, pa.string())})


# ---------------------------------------------------------------- decoders

class FakeDecoder:
    """STUB decoder tier for formats with no in-sandbox codec:
    deterministic md5-derived "image" metadata + features.

    A real deployment swaps this tier for a PIL/libav decoder loaded once
    per actor; the md5 derivation keeps the output deterministic and
    SQL-checkable meanwhile.
    """

    def __init__(self):
        # real impl: self.codec = load_codec(); torch model; etc.
        self.loaded = True

    @staticmethod
    def _decode_one(payload: bytes) -> tuple[int, int, list[float]]:
        h = hashlib.md5(payload).hexdigest()
        width = 1 + int(h[:8], 16) % 512
        height = 1 + int(h[8:16], 16) % 512
        feats = [round(int(h[i * 2:i * 2 + 2], 16) / 255.0, 6)
                 for i in range(FEATURE_DIM)]
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h, f = self._decode_one(p if isinstance(p, bytes) else
                                       bytes(p))
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


class MediaDecoder:
    """Actor-pool decode stage with REAL byte-level decoders for the
    stdlib-decodable formats (WAV via ``wave``, uncompressed 24-bit BMP
    via header parse + numpy, non-interlaced 8-bit RGB PNG via ``zlib``
    inflate + scanline unfilter) and the :class:`FakeDecoder` md5 tier
    for everything else.

    Output row per payload: (doc_id, media_type, width, height, f0, f1)
      * image/bmp  — width/height from the BMP header; f0/f1 = 2 × mean
        of the R / G channels (exact integers for any image whose channel
        sums are divisible by the pixel count; float division of two
        int64s with an integral quotient is exact in IEEE-754).
      * image/png  — width/height from IHDR; f0/f1 = 2 × mean R / G of
        the unfiltered pixels.
      * audio/wav  — width = sample rate, height = frame count;
        f0 = 2 × mean amplitude, f1 = max amplitude.
      * otherwise  — the FakeDecoder md5 features (f0/f1 = its first two).

    Decoding state (codec constructors, scratch) is built once per actor
    in ``__init__``; ``__call__`` is per batch.
    """

    def __init__(self):
        self._fake = FakeDecoder()

    @staticmethod
    def _decode_bmp(payload: bytes) -> tuple[int, int, float, float]:
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only uncompressed 24-bit BMP decodable in-sandbox "
                f"(got bpp={bpp}, compression={compression})")
        hh = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        px = np.frombuffer(payload, np.uint8, count=stride * hh,
                           offset=data_off)
        px = px.reshape(hh, stride)[:, :w * 3].reshape(hh, w, 3)
        n_px = w * hh
        f0 = (2 * int(px[:, :, 2].sum(dtype=np.int64))) / n_px   # R
        f1 = (2 * int(px[:, :, 1].sum(dtype=np.int64))) / n_px   # G
        return w, hh, float(f0), float(f1)

    @staticmethod
    def _decode_png(payload: bytes) -> tuple[int, int, float, float]:
        """Byte-level non-interlaced 8-bit RGB PNG decode: chunk walk →
        IHDR parse → IDAT concat → ``zlib`` inflate → scanline UNFILTER
        (all five spec filters: None/Sub/Up are vectorized per row;
        Average and Paeth reconstruct left-to-right — the left neighbor
        is a decode-time dependency the spec makes inherently
        sequential).  Covers what ``zlib`` can decode in-sandbox; other
        color types / bit depths raise to the labeled fake tier's
        documented NotImplementedError contract."""
        if payload[:8] != PNG_SIG:
            raise ValueError("not a PNG payload")
        pos, idat = 8, bytearray()
        w = h = depth = color = interlace = None
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos:pos + 4], "big")
            tag = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data)
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
            pos += 12 + ln          # len + tag + data + crc
        if depth != 8 or color != 2 or interlace != 0:
            raise NotImplementedError(
                f"only non-interlaced 8-bit RGB PNG decodable in-sandbox "
                f"(got depth={depth}, color={color}, interlace={interlace})")
        stride = w * 3
        flat = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
        flat = flat.reshape(h, 1 + stride)
        filters = flat[:, 0]
        rows = flat[:, 1:].astype(np.int64)
        out = np.zeros((h, stride), dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        for r in range(h):
            f, cur = int(filters[r]), rows[r]
            if f == 0:
                rec = cur
            elif f == 1:            # Sub: + left pixel (bpp=3)
                rec = cur.reshape(w, 3).cumsum(axis=0).reshape(stride) % 256
            elif f == 2:            # Up: + previous row
                rec = (cur + prev) % 256
            elif f in (3, 4):       # Average / Paeth: left-dependent
                rec = np.empty(stride, dtype=np.int64)
                for i in range(stride):
                    a = rec[i - 3] if i >= 3 else 0
                    b = prev[i]
                    if f == 3:
                        rec[i] = (cur[i] + (a + b) // 2) % 256
                    else:
                        c = prev[i - 3] if i >= 3 else 0
                        p = a + b - c
                        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = a if (pa_ <= pb and pa_ <= pc) else (
                            b if pb <= pc else c)
                        rec[i] = (cur[i] + pr) % 256
            else:
                raise NotImplementedError(f"unknown PNG filter {f}")
            out[r] = rec
            prev = rec
        px = out.reshape(h, w, 3)
        n_px = w * h
        f0 = (2 * int(px[:, :, 0].sum())) / n_px     # R
        f1 = (2 * int(px[:, :, 1].sum())) / n_px     # G
        return w, h, float(f0), float(f1)

    @staticmethod
    def _decode_wav(payload: bytes) -> tuple[int, int, float, float]:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
                raise NotImplementedError("only 16-bit mono WAV expected")
            rate = wf.getframerate()
            n = wf.getnframes()
            raw = wf.readframes(n)
        samples = np.frombuffer(raw, "<i2")
        f0 = (2 * int(samples.sum(dtype=np.int64))) / samples.size
        f1 = float(samples.max())
        return rate, n, float(f0), f1

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        types = t["media_type"].to_pylist()
        width, height, f0s, f1s = [], [], [], []
        for p, mt in zip(payloads, types):
            p = p if isinstance(p, bytes) else bytes(p)
            if mt == MEDIA_BMP:
                w, h, f0, f1 = self._decode_bmp(p)
            elif mt == MEDIA_WAV:
                w, h, f0, f1 = self._decode_wav(p)
            elif mt == MEDIA_PNG:
                w, h, f0, f1 = self._decode_png(p)
            else:
                w, h, feats = self._fake._decode_one(p)
                f0, f1 = feats[0], feats[1]
            width.append(w)
            height.append(h)
            f0s.append(f0)
            f1s.append(f1)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "f0": pa.array(f0s, pa.float64()),
            "f1": pa.array(f1s, pa.float64()),
        })


def resize_stub(width: int, height: int, target: int = 256
                ) -> tuple[int, int]:
    """STUB resize math (aspect-preserving shortest-side): pure function so
    the pipeline shape is testable without codecs."""
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decoder required for empty payloads")
    scale = target / min(width, height)
    return max(1, round(width * scale)), max(1, round(height * scale))
