"""Finding charts: annotated N-up/E-left cutouts around a sky position.

Rebuild of the reference's standalone finding-chart tool
(/root/reference/finding_chart.py:56-328, orient_data 501-622): cut out
a box around RA/DEC from a reduced image, rotate/flip it to the N-up
E-left display convention using the WCS, and render an annotated chart
with crosshair and scale bar.
"""

from __future__ import annotations

import os

import numpy as np

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.report.quicklook import zscale


def orient_north_up(img, wcs: TanWCS):
    """Rotate/flip (by 90° steps) so North is up and East left.

    Exact resampling is unnecessary for charts: the reference likewise
    snaps to the nearest cardinal orientation (orient_data, 501-622).
    """
    rot = wcs.rotation % 360.0
    k = int(round(rot / 90.0)) % 4
    out = np.rot90(img, k)
    # after rotation, East must increase leftwards: check the sign of
    # the RA gradient along +x
    cd = wcs.cd
    det = np.linalg.det(cd)
    flip = det > 0      # astronomical images have det<0 when E-left
    if k % 2 == 1:
        flip = not flip
    if flip:
        out = out[:, ::-1]
    return out


def finding_chart(path: str, image, wcs: TanWCS, ra: float, dec: float,
                  size_arcmin: float = 3.0, title: str | None = None):
    """Render an annotated PDF/PNG finding chart around (ra, dec)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x, y = wcs.sky2pix(ra, dec)
    npix = int(size_arcmin * 60.0 / wcs.pixscale)
    H, W = image.shape
    half = npix // 2
    x0 = int(np.clip(round(x) - half, 0, max(W - npix, 0)))
    y0 = int(np.clip(round(y) - half, 0, max(H - npix, 0)))
    cut = np.asarray(image[y0:y0 + npix, x0:x0 + npix], np.float32)

    disp = orient_north_up(cut, wcs)
    z1, z2 = zscale(cut)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(disp, vmin=z1, vmax=z2, cmap="gray_r", origin="lower")
    cy, cx = disp.shape[0] / 2, disp.shape[1] / 2
    gap, ln = 8, 25
    for dx, dy in ((gap, 0), (-gap - ln, 0)):
        ax.plot([cx + dx, cx + dx + (ln if dx > 0 else ln)],
                [cy, cy], "r-", lw=1)
    for dx, dy in ((0, gap), (0, -gap - ln)):
        ax.plot([cx, cx],
                [cy + dy, cy + dy + (ln if dy > 0 else ln)], "r-", lw=1)
    # scale bar: 1 arcmin
    bar = 60.0 / wcs.pixscale
    ax.plot([10, 10 + bar], [10, 10], "k-", lw=2)
    ax.text(10 + bar / 2, 14, "1'", ha="center", fontsize=9)
    ax.text(0.02, 0.98, "N up, E left", transform=ax.transAxes,
            va="top", fontsize=9)
    if title:
        ax.set_title(title, fontsize=10)
    ax.set_xticks([])
    ax.set_yticks([])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=140)
    plt.close(fig)
    return path
