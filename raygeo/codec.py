"""Deterministic image codecs: ``raw``, ``pngz`` (lossless), ``dctq`` (lossy).

The sandbox has no PIL/cv2, so the engine ships its own small, fully
deterministic codecs (numpy + zlib only). The lossy ``dctq`` codec is a
quantized 8x8 block DCT chosen so that round-trip PSNR >= 40 dB — the
invariant demanded by BASELINE.json ("decoded-pixel allclose, PSNR>=40dB for
lossy"). Encode/decode are pure functions of their inputs: the same bytes
decode to the same pixels on every worker, which is what makes the fixture
table's precomputed golden stats (pix_sum etc.) a valid oracle.

Wire format (little-endian):
  magic  4s  = b"RGC1"
  fmt    u8  (0=raw, 1=pngz, 2=dctq)
  h, w   u32
  c      u8  (channels, always 3 here)
  payload    (fmt-specific)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"RGC1"
_HDR = struct.Struct("<4sBIIB")

FMT_RAW = 0
FMT_PNGZ = 1
FMT_DCTQ = 2
FMT_CODES = {"raw": FMT_RAW, "pngz": FMT_PNGZ, "dctq": FMT_DCTQ}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}

_DCT_Q = 4.0  # uniform quant step -> coeff err <= 2 -> pixel RMSE ~1.15 -> ~47 dB


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    m = np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / (2.0 * n))
    m *= np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)
_D8T = _D8.T.copy()


def _pad_to8(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return img


def _blockwise(img: np.ndarray, mat_l: np.ndarray, mat_r: np.ndarray) -> np.ndarray:
    """Apply ``mat_l @ block @ mat_r`` to every 8x8 block of every channel.

    Batched matmul over a (hb, wb, c, 8, 8) view — bit-identical to the
    einsum formulation (verified over the full dctq fixture corpus) but
    without einsum's per-call contraction-path search.
    """
    h, w, c = img.shape
    b = img.reshape(h // 8, 8, w // 8, 8, c).transpose(0, 2, 4, 1, 3)
    out = mat_l @ b @ mat_r
    return np.ascontiguousarray(out.transpose(0, 3, 1, 4, 2)).reshape(h, w, c)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an ``(h, w, 3) uint8`` array into self-describing bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3:
        raise ValueError("expected (h, w, c) uint8")
    h, w, c = pixels.shape
    code = FMT_CODES[fmt]
    hdr = _HDR.pack(MAGIC, code, h, w, c)
    if code == FMT_RAW:
        payload = pixels.tobytes()
    elif code == FMT_PNGZ:
        # up-filter (row delta) then zlib: cheap, fully lossless
        delta = np.empty_like(pixels)
        delta[0] = pixels[0]
        np.subtract(pixels[1:], pixels[:-1], out=delta[1:])
        payload = zlib.compress(delta.tobytes(), 6)
    elif code == FMT_DCTQ:
        padded = _pad_to8(pixels.astype(np.float64) - 128.0)
        coeff = _blockwise(padded, _D8, _D8T)
        q = np.rint(coeff / _DCT_Q).astype(np.int16)
        payload = zlib.compress(q.tobytes(), 6)
    else:  # pragma: no cover
        raise ValueError(fmt)
    return hdr + payload


def decode(buf: bytes) -> np.ndarray:
    """Decode bytes produced by :func:`encode` back to ``(h, w, 3) uint8``."""
    magic, code, h, w, c = _HDR.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("bad magic")
    payload = buf[_HDR.size :]
    if code == FMT_RAW:
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, c).copy()
    if code == FMT_PNGZ:
        delta = np.frombuffer(zlib.decompress(payload), dtype=np.uint8).reshape(h, w, c)
        # uint8 cumsum wraps mod 256, exactly inverting the uint8 row delta
        return np.cumsum(delta, axis=0, dtype=np.uint8)
    if code == FMT_DCTQ:
        ph, pw = h + ((-h) % 8), w + ((-w) % 8)
        q = np.frombuffer(zlib.decompress(payload), dtype=np.int16).reshape(ph, pw, c)
        rec = _blockwise(q.astype(np.float64) * _DCT_Q, _D8T, _D8)
        rec = np.clip(np.rint(rec + 128.0), 0, 255)
        return rec[:h, :w].astype(np.uint8)
    raise ValueError(f"unknown fmt code {code}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
