"""Finding charts (report/finding_chart.py)."""

import os

import numpy as np

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.report.finding_chart import finding_chart, orient_north_up


def _image_with_star(shape=(400, 400), star=(220.0, 180.0)):
    rng = np.random.default_rng(0)
    img = rng.normal(100.0, 3.0, shape).astype(np.float32)
    sy, sx = int(star[1]), int(star[0])
    img[sy - 1:sy + 2, sx - 1:sx + 2] += 500.0
    return img


def test_orient_north_up_cardinal():
    img = np.zeros((10, 12), np.float32)
    img[0, 0] = 1.0                       # bottom-left marker
    # E-left (det<0), N-up, no rotation: unchanged
    w = TanWCS.simple(150.0, -30.0, 1.0, img.shape, rot_deg=0.0,
                      flip_x=True)
    out = orient_north_up(img, w)
    assert out[0, 0] == 1.0
    # E-right parity gets mirrored
    w2 = TanWCS.simple(150.0, -30.0, 1.0, img.shape, rot_deg=0.0,
                       flip_x=False)
    out2 = orient_north_up(img, w2)
    assert out2[0, -1] == 1.0
    # 90-degree rotation transposes the shape
    w3 = TanWCS.simple(150.0, -30.0, 1.0, img.shape, rot_deg=90.0)
    assert orient_north_up(img, w3).shape == (12, 10)


def test_finding_chart_renders(tmp_path):
    img = _image_with_star()
    wcs = TanWCS.simple(150.0, -30.0, 1.0, img.shape)   # 1 arcsec/pix
    ra, dec = wcs.pix2sky(220.0, 180.0)
    out = str(tmp_path / "chart.png")
    finding_chart(out, img, wcs, float(ra), float(dec),
                  size_arcmin=2.0, title="test target")
    assert os.path.exists(out) and os.path.getsize(out) > 5000
