"""CubeSpec: the cube manifest — create / load / overwrite semantics.

Mirrors the reference's dataset-accessor class constants and ``create``
(``core/accessor.py:58-64`` and ``:206-296``) minus the zero-filled zarr
skeleton: a Ray-Data cube is lazy, so "create" only writes a ``cube.json``
manifest (grid + channels + dtypes + time axis) and an empty ``lineage/``
directory. An absent tile reads as the channel's nodata fill — equivalent to
the reference's ``xr_zeros`` skeleton without materializing anything.

Create semantics match the reference exactly: double-create raises
``FileExistsError`` unless ``exists_ok`` (``accessor.py:229-234``,
tests/test_creation.py:122-140), ``overwrite=True`` clobbers.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np

from .grid import GridSpec

MANIFEST = "cube.json"
LINEAGE_DIR = "lineage"
TILES_DIR = "tiles"


@dataclass(frozen=True)
class Channel:
    """One cube variable: name + dtype encoding + nodata + metadata
    (reference ``_channels_encoding`` / ``_channels_meta``,
    ``accessor.py:62-64``; e.g. ``arcticdem.py:159-172``). ``ncomp`` packs
    same-dtype components into one array (the RGB triple); the reference
    models those as separate variables, which ``ncomp=1`` reproduces."""

    name: str
    dtype: str = "float32"  # numpy dtype string
    nodata: float = 0.0
    ncomp: int = 1
    metadata: dict = field(default_factory=dict)


@dataclass(frozen=True)
class CubeSpec:
    """Declared, class-level schema of one cube (reference accessor.py:58-64)."""

    title: str
    grid: GridSpec
    channels: tuple[Channel, ...]

    def channel_names(self) -> list[str]:
        return [c.name for c in self.channels]

    def to_dict(self) -> dict:
        return {
            "title": self.title,
            "grid": self.grid.to_dict(),
            "channels": [
                {"name": c.name, "dtype": c.dtype, "nodata": c.nodata,
                 "ncomp": c.ncomp, "metadata": c.metadata}
                for c in self.channels
            ],
        }

    @staticmethod
    def from_dict(d: dict) -> "CubeSpec":
        return CubeSpec(
            title=d["title"],
            grid=GridSpec.from_dict(d["grid"]),
            channels=tuple(
                Channel(c["name"], c["dtype"], c["nodata"],
                        c.get("ncomp", 1), c.get("metadata", {}))
                for c in d["channels"]
            ),
        )

    # coordinate arrays (tests assert exact np.arange parity,
    # tests/test_creation.py:76-115 analog)
    def x_coords(self) -> np.ndarray:
        g = self.grid
        return g.x0 + (np.arange(g.width, dtype=np.float64) + 0.5) * g.res

    def y_coords(self) -> np.ndarray:
        g = self.grid
        return g.y1 - (np.arange(g.height, dtype=np.float64) + 0.5) * g.res

    def chunk_tuples(self) -> dict[str, tuple[int, ...]]:
        """Per-axis chunk layouts like zarr's (accessor.py:264-268 analog)."""
        g = self.grid

        def axis(n: int) -> tuple[int, ...]:
            full, rem = divmod(n, g.chunk)
            return (g.chunk,) * full + ((rem,) if rem else ())

        out = {"x": axis(g.width), "y": axis(g.height)}
        if g.temporal:
            out["time"] = (1,) * len(g.times)
        return out


def create(spec: CubeSpec, path: str, overwrite: bool = False,
           exists_ok: bool = False) -> str:
    """Initialize an empty cube at ``path`` (reference accessor.py:206-296)."""
    manifest = os.path.join(path, MANIFEST)
    if os.path.exists(manifest):
        if overwrite:
            shutil.rmtree(path)
        elif exists_ok:
            return path
        else:
            raise FileExistsError(f"cube already exists at {path}")
    os.makedirs(os.path.join(path, LINEAGE_DIR), exist_ok=True)
    os.makedirs(os.path.join(path, TILES_DIR), exist_ok=True)
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(spec.to_dict(), f, indent=2, sort_keys=True)
    os.replace(tmp, manifest)  # atomic commit, "Initialize empty datacube"
    return path


def load_spec(path: str) -> CubeSpec:
    manifest = os.path.join(path, MANIFEST)
    if not os.path.exists(manifest):
        raise FileNotFoundError(
            f"cube not created at {path} (reference assert_created, "
            "core/backend.py:187-200)"
        )
    with open(manifest) as f:
        return CubeSpec.from_dict(json.load(f))


def assert_created(path: str) -> None:
    load_spec(path)
