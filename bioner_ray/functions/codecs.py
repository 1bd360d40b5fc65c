"""Pure-numpy media codecs for REAL byte formats — no external libs.

The container has no PIL/ffmpeg/soundfile, but several production
formats are simple enough to parse exactly with numpy; implementing
them makes the multimodal stages genuine codec paths rather than
byte-reshaping stubs:

- netpbm ``P5`` (PGM, grayscale) / ``P6`` (PPM, RGB) binary images —
  the interchange format every image tool emits (spec: netpbm(5));
  header tokens separated by whitespace, ``#`` comments allowed.
- Windows ``BMP`` (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB),
  bottom-up rows padded to 4 bytes, BGR order; negative height =
  top-down (spec: MS WindowsBMP docs).
- ``WAV`` (RIFF) PCM, 8-bit unsigned / 16-bit signed, any channel
  count; chunk walker skips unknown chunks (spec: RIFF/WAVE).
- ``Y4M`` (YUV4MPEG2) video, ``Cmono`` and ``C420``-family
  colorspaces; textual stream header + per-frame ``FRAME`` headers
  (spec: mjpegtools yuv4mpeg(5)).

Every decoder round-trips its encoder bit-exactly (tests pin this) and
raises ``ValueError`` on malformed bytes — never returns junk. The
PIL/ffmpeg seam in ``stages/multimodal.py`` stays import-gated for
compressed formats (JPEG/PNG/MP4); these cover the uncompressed tier.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(payload: bytes) -> str | None:
    """Magic-byte format detection: 'pgm' | 'ppm' | 'bmp' | 'wav' |
    'y4m' | None (unknown)."""
    if payload.startswith(b"P5"):
        return "pgm"
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"YUV4MPEG2 "):
        return "y4m"
    return None


# ---------------------------------------------------------------- netpbm

def encode_pgm(img: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"PGM needs a 2-D gray image, got shape {img.shape}")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"PPM needs an (h, w, 3) RGB image, got shape {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pnm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer header tokens starting at
    ``start``, honoring ``#…\\n`` comments; returns (tokens, offset past
    the single whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = start
    cur = b""
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
        i += 1
    return toks, i


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary PGM/PPM → (h, w) or (h, w, 3) uint8."""
    kind = sniff(payload)
    if kind not in ("pgm", "ppm"):
        raise ValueError("not a binary PGM/PPM payload")
    (w, h, maxval), off = _pnm_tokens(payload, 3, 2)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    ch = 1 if kind == "pgm" else 3
    need = w * h * ch
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError(f"truncated raster: {len(raster)} < {need}")
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, 3)


# ------------------------------------------------------------------- bmp

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 → 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up, BGR, rows padded to 4 bytes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"BMP needs (h, w[, 3]) uint8, got shape {img.shape}")
    h, w, _ = img.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR pixel order
    if pad:
        rows = np.zeros((h, row_raw + pad), dtype=np.uint8)
        rows[:, :row_raw] = bgr.reshape(h, row_raw)
        raster = rows.tobytes()
    else:
        raster = bgr.tobytes()
    data_off = 14 + 40
    size = data_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (h, w, 3) uint8 RGB."""
    if sniff(payload) != "bmp" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    nch = bpp // 8
    stride = (w * nch + 3) // 4 * 4
    need = stride * h
    raster = payload[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError(f"truncated BMP raster: {len(raster)} < {need}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * nch].reshape(h, w, nch)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def decode_image(payload: bytes) -> np.ndarray:
    """Any supported image payload → (h, w) uint8 GRAY (RGB collapses
    via integer BT.601 luma — deterministic, no float rounding)."""
    kind = sniff(payload)
    if kind in ("pgm", "ppm"):
        img = decode_netpbm(payload)
    elif kind == "bmp":
        img = decode_bmp(payload)
    else:
        raise ValueError(f"unsupported image payload (magic={payload[:2]!r})")
    if img.ndim == 2:
        return img
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


# ------------------------------------------------------------------- wav

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 PCM → RIFF/WAVE bytes."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (8-bit unsigned or 16-bit signed) → ((n, ch)
    int16, sample_rate); unknown chunks are skipped per the RIFF walk."""
    if sniff(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], dtype="<i2")
    else:
        u8 = np.frombuffer(data[: len(data) // ch * ch], dtype=np.uint8)
        arr = ((u8.astype(np.int16) - 128) << 8)
    return arr.reshape(-1, ch), rate


# ------------------------------------------------------------------- y4m

def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (30, 1)) -> bytes:
    """(n, h, w) uint8 gray frames → YUV4MPEG2 ``Cmono`` stream."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"Y4M needs (n, h, w) gray frames, got shape {frames.shape}")
    n, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps[0], fps[1])]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 (``Cmono`` or ``C420``-family) → (n, h, w) uint8 luma
    frames (chroma planes are parsed past, not returned)."""
    if sniff(payload) != "y4m":
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = 0
    cspace = "420"  # yuv4mpeg(5): C absent → 4:2:0 assumed
    for tok in payload[10:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            cspace = tok[1:].decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cspace == "mono":
        frame_bytes = w * h
    elif cspace.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cspace}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME header at {pos}")
        start = fnl + 1
        if start + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        luma = np.frombuffer(payload[start : start + w * h], dtype=np.uint8)
        frames.append(luma.reshape(h, w))
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8)
