"""CCD channel geometry.

The MeerLICHT/BlackGEM detector is a single CCD read out through
``ny x nx = 2 x 8`` amplifier channels.  Each channel delivers a
``ysize_chan x xsize_chan`` data section plus a vertical overscan strip
(columns, to the right of the data in mosaic coordinates) and a horizontal
overscan strip (rows, adjacent to the CCD centre line — the two channel rows
read out towards the centre).  Channel indices on the mosaic are::

    [ 8  9 10 11 12 13 14 15]     (top row,   y-mirrored readout)
    [ 0  1  2  3  4  5  6  7]     (bottom row)

Semantics follow ``define_sections`` in the reference
(/root/reference/blackbox.py:6334-6402 and Settings/set_blackbox.py:334-337),
but the native representation here is different: instead of slicing one big
mosaic with per-channel slice tuples, frames live on device as **channel
stacks** ``(n_chan, ysize_chan, xsize_chan)`` — a uniform, batch-friendly
layout that vmaps and matmuls cleanly on TPU — and the 2-D mosaic is a pure
reshape/transpose view materialised only for full-frame stages.

Everything is parametric so tests can run tiny geometries on CPU.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


def _xp_of(arr):
    """numpy for host arrays, jax.numpy for device/traced arrays."""
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


@dataclasses.dataclass(frozen=True)
class CCDGeometry:
    """Static description of the raw-frame channel layout."""

    ny: int = 2            # channel rows on the CCD (must be 2: mirror readout)
    nx: int = 8            # channel columns
    ysize_chan: int = 5280  # rows in one channel's data section
    xsize_chan: int = 1320  # columns in one channel's data section
    ysize_os: int = 20      # horizontal-overscan rows per channel
    xsize_os: int = 32      # vertical-overscan columns per channel
    # contaminated pixels cut at the data-adjacent edge of the overscans
    # (reference blackbox.py:6378-6394: ncut=5 vertical, ncut=10 horizontal,
    # plus the last vertical-overscan column is discarded)
    ncut_vert: int = 5
    ncut_hori: int = 10

    def __post_init__(self):
        if self.ny != 2:
            raise ValueError("CCDGeometry requires ny == 2 (mirror readout)")

    # ---- derived sizes -------------------------------------------------

    @property
    def n_chan(self) -> int:
        return self.ny * self.nx

    @property
    def dy(self) -> int:
        """Full channel height in the raw mosaic (data + horizontal os)."""
        return self.ysize_chan + self.ysize_os

    @property
    def dx(self) -> int:
        """Full channel width in the raw mosaic (data + vertical os)."""
        return self.xsize_chan + self.xsize_os

    @property
    def raw_shape(self) -> tuple[int, int]:
        return (self.ny * self.dy, self.nx * self.dx)

    @property
    def red_shape(self) -> tuple[int, int]:
        """Shape of the reduced (overscan-stripped) image."""
        return (self.ny * self.ysize_chan, self.nx * self.xsize_chan)

    @property
    def chan_shape(self) -> tuple[int, int, int]:
        return (self.n_chan, self.ysize_chan, self.xsize_chan)

    @property
    def os_vert_width(self) -> int:
        """Usable vertical-overscan columns after edge cuts."""
        return max(self.xsize_os - self.ncut_vert - 1, 0)

    @property
    def os_hori_height(self) -> int:
        """Usable horizontal-overscan rows after edge cuts."""
        return max(self.ysize_os - self.ncut_hori, 0)

    # ---- host-side slice tables (numpy indexing on the raw mosaic) -----

    @cached_property
    def chan_sec(self) -> tuple:
        """Per-channel slices incl. overscans (reference ``chan_sec``)."""
        dy, dx = self.dy, self.dx
        return tuple(
            (slice(iy * dy, (iy + 1) * dy), slice(ix * dx, (ix + 1) * dx))
            for iy in range(self.ny) for ix in range(self.nx)
        )

    @cached_property
    def data_sec(self) -> tuple:
        """Per-channel data-section slices in the raw mosaic."""
        out = []
        for iy in range(self.ny):
            y0 = self._data_y0(iy)
            for ix in range(self.nx):
                x0 = ix * self.dx
                out.append((slice(y0, y0 + self.ysize_chan),
                            slice(x0, x0 + self.xsize_chan)))
        return tuple(out)

    @cached_property
    def os_sec_vert(self) -> tuple:
        """Usable vertical-overscan slices (full channel height)."""
        dy, dx = self.dy, self.dx
        x_lo = self.xsize_chan + self.ncut_vert
        return tuple(
            (slice(iy * dy, (iy + 1) * dy),
             slice(ix * dx + x_lo, (ix + 1) * dx - 1))
            for iy in range(self.ny) for ix in range(self.nx)
        )

    @cached_property
    def os_sec_hori(self) -> tuple:
        """Usable horizontal-overscan slices (full channel width).

        Keeps the rows farthest from the data section (the ``ncut_hori``
        rows next to the data are flux-contaminated).
        """
        dy, dx = self.dy, self.dx
        h = self.os_hori_height
        out = []
        for iy in range(self.ny):
            if iy == 0:      # bottom row: os strip above data, keep top rows
                y0 = dy - h
            else:            # top row: os strip below data, keep bottom rows
                y0 = dy
            for ix in range(self.nx):
                out.append((slice(y0, y0 + h),
                            slice(ix * dx, (ix + 1) * dx)))
        return tuple(out)

    @cached_property
    def data_sec_red(self) -> tuple:
        """Per-channel slices in the reduced (overscan-stripped) mosaic."""
        out = []
        for iy in range(self.ny):
            y0 = iy * self.ysize_chan
            for ix in range(self.nx):
                x0 = ix * self.xsize_chan
                out.append((slice(y0, y0 + self.ysize_chan),
                            slice(x0, x0 + self.xsize_chan)))
        return tuple(out)

    def _data_y0(self, iy: int) -> int:
        """Raw-mosaic row where channel-row ``iy``'s data section starts."""
        # bottom channels: data first, overscan towards centre;
        # top channels: overscan towards centre first, then data.
        return iy * self.dy + (self.ysize_os if iy == 1 else 0)

    # ---- layout transforms (work on numpy or jax arrays) ---------------

    def split_raw(self, raw):
        """Raw mosaic -> (chan_data, os_vert, os_hori) stacks.

        chan_data : (n_chan, ysize_chan, xsize_chan)
        os_vert   : (n_chan, dy, os_vert_width)   usable v-overscan columns
        os_hori   : (n_chan, os_hori_height, dx)  usable h-overscan rows

        Stacks are in mosaic orientation (no flips); channel ``c`` is
        ``(iy, ix) = divmod(c, nx)`` with the bottom row first.
        """
        import jax
        xp = np
        if isinstance(raw, jax.Array):
            import jax.numpy as xp  # noqa: F811

        ny, nx, dy, dx = self.ny, self.nx, self.dy, self.dx
        # (ny, dy, nx, dx) -> (ny, nx, dy, dx) -> (C, dy, dx)
        chans = raw.reshape(ny, dy, nx, dx).transpose(0, 2, 1, 3)
        chans = chans.reshape(self.n_chan, dy, dx)

        ych, xch = self.ysize_chan, self.xsize_chan
        bottom = chans[:nx, :ych]
        top = chans[nx:, self.ysize_os:]
        chan_data = xp.concatenate(
            [bottom[:, :, :xch], top[:, :, :xch]], axis=0)

        x_lo = xch + self.ncut_vert
        os_vert = chans[:, :, x_lo:dx - 1]

        # keep the rows farthest from the data section (nearest CCD centre):
        # bottom channels -> last rows of the strip, top channels -> first
        h = self.os_hori_height
        os_hori = xp.concatenate(
            [chans[:nx, dy - h:dy, :], chans[nx:, 0:h, :]], axis=0)

        return chan_data, os_vert, os_hori

    def assemble(self, chan_data):
        """Channel stack (n_chan, ych, xch) -> reduced mosaic (2*ych, nx*xch).

        Formulated as concatenations (not reshape+transpose): on TPU the
        4-D transpose materialises a (H, nx, xch, 1)-shaped fusion output
        whose degenerate minor dim gets tile-padded x128 (~57 GB at full
        MeerLICHT size); concat lowering keeps native 2-D layouts.
        """
        ny, nx = self.ny, self.nx
        xp = _xp_of(chan_data)
        rows = [xp.concatenate([chan_data[iy * nx + ix]
                                for ix in range(nx)], axis=1)
                for iy in range(ny)]
        return xp.concatenate(rows, axis=0)

    def disassemble(self, mosaic):
        """Reduced mosaic -> channel stack (inverse of :meth:`assemble`)."""
        ny, nx = self.ny, self.nx
        ych, xch = self.ysize_chan, self.xsize_chan
        xp = _xp_of(mosaic)
        chans = [mosaic[iy * ych:(iy + 1) * ych, ix * xch:(ix + 1) * xch]
                 for iy in range(ny) for ix in range(nx)]
        return xp.stack(chans, axis=0)

    # convenience: per-channel mosaic row parity (top channels are the
    # mirror-readout row; stencil ops that care about readout direction
    # flip these channels)
    @cached_property
    def chan_is_top(self) -> np.ndarray:
        return np.repeat(np.arange(self.ny) == 1, self.nx)


# canonical instruments ------------------------------------------------------

MEERLICHT = CCDGeometry()  # 10600 x 10816 raw, 10560 x 10560 reduced

# small geometry for tests: same structure, ~1000x fewer pixels
TINY = CCDGeometry(ysize_chan=66, xsize_chan=40, ysize_os=12, xsize_os=14,
                   ncut_vert=3, ncut_hori=4)
