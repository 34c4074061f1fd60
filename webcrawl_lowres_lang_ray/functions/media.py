"""Stdlib-only media codecs for the multimodal stages.

No image/audio libraries exist in this container, but two formats are fully
decodable with the standard library alone, so those kernels are REAL:

* PNG — encoder (8-bit gray/RGB/RGBA, filter 0, correct CRCs) and decoder
  (any of the five scanline filters, non-interlaced 8-bit gray/RGB/RGBA)
  built on ``zlib`` + ``struct`` + numpy unfiltering;
* WAV — PCM16 encode/decode via the ``wave`` module + numpy.

JPEG/GIF pixel decoding genuinely needs a DCT/LZW stack, so for those only
the HEADER parse is real (dimensions/components from the marker stream) and
pixel decode stays import-gated — the line between real and stubbed is
format-by-format, not a blanket fake.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def png_encode(arr: np.ndarray) -> bytes:
    """8-bit grayscale (h,w), RGB (h,w,3) or RGBA (h,w,4) -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_chunks(data: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        yield tag, data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array ((h,w) gray, (h,w,2) gray+alpha, (h,w,3)
    RGB, (h,w,4) RGBA).  Handles all five scanline filters; 8-bit,
    non-interlaced (what every encoder here and most crawled thumbnails
    emit)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    w = h = None
    nch = 0
    idat = b""
    for tag, payload in _png_chunks(data):
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"png depth={depth} color={color_type} interlace={interlace}"
                )
            nch = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        up = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = line + up
        elif ftype == 1:  # Sub: prefix dependence per channel -> cumsum
            rec = line.copy()
            for k in range(nch):
                rec[k::nch] = np.cumsum(rec[k::nch])
        elif ftype == 3:  # Average
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                rec[i] = line[i] + ((a + up[i]) >> 1)
                rec[i] &= 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                c = up[i - nch] if i >= nch else 0
                rec[i] = line[i] + _paeth(int(a), int(up[i]), int(c))
                rec[i] &= 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    if nch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, nch)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy indexing — the batch kernel)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# image header sniffing (PNG real decode; JPEG/GIF header-only)
# ---------------------------------------------------------------------------

def parse_image_header(data: bytes) -> dict | None:
    """Format + dimensions from the container header (no pixel decode)."""
    if data.startswith(_PNG_SIG):
        for tag, payload in _png_chunks(data):
            if tag == b"IHDR":
                w, h, depth, color_type = struct.unpack(">IIBB", payload[:10])
                return {
                    "format": "png", "width": w, "height": h,
                    "channels": _CHANNELS.get(color_type, 0), "bit_depth": depth,
                }
        return None
    if data[:2] == b"\xFF\xD8":  # JPEG: walk the marker stream to SOFn
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            # skip fill bytes, standalone markers (SOI/TEM/RSTn/EOI have no
            # length field), and stop at start-of-scan / end-of-image
            if marker in (0xFF, 0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2 if marker != 0xFF else 1
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: no SOF seen
                return None
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            if seglen < 2:
                return None  # malformed length — stop rather than loop
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                if pos + 10 > len(data):
                    return None  # truncated SOF segment
                _prec, h, w, ncomp = struct.unpack(
                    ">BHHB", data[pos + 4 : pos + 10]
                )
                return {"format": "jpeg", "width": w, "height": h,
                        "channels": ncomp, "bit_depth": 8}
            pos += 2 + seglen
        return None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h, "channels": 3,
                "bit_depth": 8}
    return None


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples -> WAV bytes (stdlib ``wave`` writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    if nch > 1:
        frames = frames.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return frames, rate
