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
    """Declared, class-level schema of one cube (reference accessor.py:58-64).

    ``post_create`` / ``post_init`` (VERDICT r4 #5 — the reference's
    lifecycle hooks, ``core/accessor.py:125-127, 298-300``; e.g.
    ArcticDEM's extent-index download rides ``post_create``,
    ``datasets/arcticdem.py:187-189``): optional ``hook(path, spec)``
    callables. ``post_create`` runs once, after :func:`create` commits
    the manifest of a NEW cube (not on an ``exists_ok`` short-circuit —
    creation-time setup like index downloads must not re-run per open).
    ``post_init`` runs on every :func:`init_cube` (the accessor-
    construction analog: per-process session setup). Hooks are code,
    not manifest state — they do not serialize into ``cube.json`` and
    are carried by the spec OBJECT the caller holds, exactly like the
    reference's dataset-subclass methods."""

    title: str
    grid: GridSpec
    channels: tuple[Channel, ...]
    post_create: object = field(default=None, compare=False, repr=False)
    post_init: object = field(default=None, compare=False, repr=False)

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
    """Initialize an empty cube at ``path`` (reference accessor.py:206-296).

    Invokes ``spec.post_create(path, spec)`` after the manifest commit of
    a NEW cube (reference ``accessor.py:298-300``); an ``exists_ok``
    short-circuit skips it."""
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
    if spec.post_create is not None:
        spec.post_create(path, spec)
    return path


def init_cube(path: str, spec: CubeSpec | None = None) -> CubeSpec:
    """Per-process cube session setup — the accessor-construction analog
    (reference ``core/accessor.py:125-127``: ``post_init`` runs when the
    dataset accessor is instantiated). Asserts the cube exists, loads its
    manifest, and invokes ``post_init(path, spec)`` from the caller's
    spec object (hooks are code, so they ride the spec the caller holds,
    not the JSON manifest). Returns the manifest spec."""
    loaded = load_spec(path)
    hook = spec.post_init if spec is not None else None
    if hook is not None:
        hook(path, loaded)
    return loaded


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
