"""ChannelPack: per-channel dtype layout for cube canvases and fragments.

The reference's core data model is N named channels with per-channel dtype
encodings (``core/accessor.py:62-64,236-276``): ArcticDEM ships
``dem:float32 + datamask:bool`` (``datasets/arcticdem.py:159-172``),
TCTrend 3x ``uint8`` (``datasets/tctrend.py:38-57``), AlphaEarth 64x
``float32`` (``datasets/alphaearth.py:38-46``), and the reference tests
exercise ``uint16`` (``tests/test_creation.py:20-24``). This module carries
that model through the Ray ingest/mosaic/load path: a canvas is a list of
per-channel numpy arrays (``(H, W)`` or ``(H, W, ncomp)``), serialized as
one concatenated buffer on the wire.

Pixel values for non-RGB channels are DERIVED deterministically from the
decoded uint8 RGB of the source image — the analog of the reference's
per-dataset accessor transforms (e.g. TCTrend's normalize,
``tctrend.py:71-88``): the source rows are always the BASELINE.json
image+caption table, and each dataset's channels define how raw pixels map
into cube variables. Derivers are pure (numpy in, numpy out), so the numpy
oracles in tests replay them exactly.
"""

from __future__ import annotations

import numpy as np

from .cube import Channel

# the canonical image cube: one 3-component uint8 channel
RGB_CHANNELS = (Channel("rgb", "uint8", 0.0, ncomp=3),)

# ArcticDEM-shaped spec: continuous float32 value + bool validity channel
# (arcticdem.py:159-172 analog, derived from the fixture's RGB pixels)
DEM_CHANNELS = (
    Channel("dem", "float32", float("nan")),
    Channel("datamask", "bool", 0.0),
)


def _derive_rgb(rgb: np.ndarray) -> np.ndarray:
    return rgb


def _derive_gray(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def _derive_dem(rgb: np.ndarray) -> np.ndarray:
    # continuous elevation-like value: 12 bits of (r, g) scaled to 1/16 units
    return (
        (rgb[..., 0].astype(np.float32) * 256.0 + rgb[..., 1].astype(np.float32))
        / 16.0
    )


def _derive_datamask(rgb: np.ndarray) -> np.ndarray:
    return rgb[..., 2] >= 128


_DERIVERS = {
    "rgb": _derive_rgb,
    "gray": _derive_gray,
    "dem": _derive_dem,
    "datamask": _derive_datamask,
}


def _default_deriver(ch: Channel):
    fn = _DERIVERS.get(ch.name)
    if fn is not None:
        return fn
    dt = np.dtype(ch.dtype)

    def cast_gray(rgb: np.ndarray) -> np.ndarray:
        return _derive_gray(rgb).astype(dt)

    return cast_gray


class ChannelPack:
    """Value object: layout + kernels for one cube's channel tuple.

    All methods operate on a *canvas*: a list of per-channel arrays, shape
    ``(H, W, ncomp)`` when ``ncomp > 1`` else ``(H, W)``. Masks passed in
    are always ``(H, W)`` bool and broadcast over components.
    """

    def __init__(self, channels: tuple[Channel, ...] = RGB_CHANNELS):
        if not channels:
            raise ValueError("a cube needs at least one channel")
        self.channels = tuple(channels)
        self.dtypes = [np.dtype(c.dtype) for c in channels]
        self.ncomps = [int(getattr(c, "ncomp", 1) or 1) for c in channels]
        self.derivers = [_default_deriver(c) for c in channels]
        # bytes per pixel over all channels (wire size of one pixel)
        self.nbytes_px = int(
            sum(dt.itemsize * nc for dt, nc in zip(self.dtypes, self.ncomps))
        )

    # ---- identity / keys -------------------------------------------------
    @property
    def is_rgb(self) -> bool:
        return (
            len(self.channels) == 1
            and self.dtypes[0] == np.uint8
            and self.ncomps[0] == 3
        )

    def _shape(self, h: int, w: int, i: int) -> tuple:
        nc = self.ncomps[i]
        return (h, w, nc) if nc > 1 else (h, w)

    # ---- canvas lifecycle ------------------------------------------------
    def alloc(self, h: int, w: int) -> list[np.ndarray]:
        return [
            np.zeros(self._shape(h, w, i), dtype=dt)
            for i, dt in enumerate(self.dtypes)
        ]

    def derive(self, rgb: np.ndarray) -> list[np.ndarray]:
        """Decoded uint8 RGB (h, w, 3) -> per-channel arrays."""
        return [fn(rgb).astype(dt, copy=False)
                for fn, dt in zip(self.derivers, self.dtypes)]

    # ---- wire format -----------------------------------------------------
    def to_bytes(self, arrs: list[np.ndarray]) -> bytes:
        return b"".join(np.ascontiguousarray(a).tobytes() for a in arrs)

    def from_bytes(self, buf: bytes, h: int, w: int) -> list[np.ndarray]:
        out, off = [], 0
        for i, dt in enumerate(self.dtypes):
            n = h * w * self.ncomps[i] * dt.itemsize
            out.append(
                np.frombuffer(buf[off : off + n], dtype=dt).reshape(
                    self._shape(h, w, i)
                )
            )
            off += n
        return out

    # ---- fold / merge kernels -------------------------------------------
    def region(self, arrs: list[np.ndarray], ys: slice, xs: slice) -> list[np.ndarray]:
        return [a[ys, xs] for a in arrs]

    def overwrite(self, dst: list[np.ndarray], src: list[np.ndarray]) -> None:
        for d, s in zip(dst, src):
            d[...] = s

    def assign_where(self, dst: list[np.ndarray], src: list[np.ndarray],
                     mask: np.ndarray) -> None:
        """dst[mask] = src[mask] per channel ((H, W) bool mask)."""
        for d, s in zip(dst, src):
            d[mask] = s[mask]

    def max_where(self, dst: list[np.ndarray], src: list[np.ndarray],
                  written: np.ndarray) -> None:
        """Elementwise per-channel max on ``written`` px, plain copy on the
        rest (the ``mode='max'`` temporal-collapse fold, stac.py:141-143)."""
        for d, s, nc in zip(dst, src, self.ncomps):
            w = written[..., None] if nc > 1 else written
            np.maximum(d, s, out=d, where=w)
            inv = ~written
            d[inv] = s[inv]

    def fill_invalid(self, arrs: list[np.ndarray], valid: np.ndarray) -> list[np.ndarray]:
        """Final-tile normalization: invalid px = the channel's nodata."""
        out = []
        for a, ch, dt in zip(arrs, self.channels, self.dtypes):
            a = a.copy()
            nodata = (
                np.array(ch.nodata, dtype=dt)
                if not (dt.kind == "f" and np.isnan(ch.nodata))
                else np.array(np.nan, dtype=dt)
            )
            a[~valid] = nodata
            out.append(a)
        return out

    # ---- golden stats ----------------------------------------------------
    def pix_sum(self, arrs: list[np.ndarray], valid: np.ndarray) -> int:
        """Deterministic int64 content checksum over valid pixels.

        Integer/bool channels sum exactly; float channels sum in float64 over
        the fixed canvas layout (order-independent across merge plans because
        the final canvas is identical) and round at 1e-3.
        """
        total = 0
        for a, dt, nc in zip(arrs, self.dtypes, self.ncomps):
            vals = a[valid]  # (n, nc) or (n,)
            if dt.kind in ("u", "i", "b"):
                total += int(vals.astype(np.int64).sum())
            else:
                total += int(round(float(np.nansum(vals.astype(np.float64))) * 1000))
        return total
