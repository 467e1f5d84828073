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


def test_orient_data_arbitrary_angle():
    """A star in a 23.7deg-rotated frame must land within 1 px of its
    N-up/E-left position after the arbitrary-angle remap."""
    from blackbox_tpu.report.finding_chart import orient_data

    n = 201
    img = np.full((n, n), 100.0, np.float32)
    # star NORTH-EAST of centre in sky terms: place it via the wcs
    wcs = TanWCS.simple(150.0, -30.0, 1.0, (n, n), rot_deg=23.7)
    ra0, dec0 = wcs.pix2sky((n - 1) / 2.0, (n - 1) / 2.0)
    ra_s = float(ra0) + 30.0 / 3600.0 / np.cos(np.deg2rad(dec0))
    dec_s = float(dec0) + 20.0 / 3600.0
    xs, ys = wcs.sky2pix(ra_s, dec_s)
    img[int(round(float(ys))), int(round(float(xs)))] += 800.0

    out = orient_data(img, wcs)
    assert out.shape == img.shape
    # in N-up/E-left at 1"/px: star at centre + (-30 E-left, +20 N-up)
    cy = cx = (n - 1) / 2.0
    iy, ix = np.unravel_index(np.argmax(out), out.shape)
    assert abs(iy - (cy + 20.0)) <= 1.0, (iy, ix)
    assert abs(ix - (cx - 30.0)) <= 1.0, (iy, ix)


def test_orient_data_header_out_and_shortcuts():
    from blackbox_tpu.report.finding_chart import orient_data

    n = 64
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (n, n)).astype(np.float32)
    w_rot = TanWCS.simple(10.0, 5.0, 1.0, (n, n), rot_deg=17.0)
    # same matrix -> untouched (no remap, same object values)
    np.testing.assert_array_equal(orient_data(img, w_rot, wcs_out=w_rot),
                                  img)
    # header_out: orienting to its OWN frame after orienting away
    # round-trips within interpolation error
    w_nup = TanWCS.simple(10.0, 5.0, 1.0, (n, n), rot_deg=0.0)
    once = orient_data(img, w_rot, wcs_out=w_nup)
    back = orient_data(once, w_nup, wcs_out=w_rot)
    core = (slice(16, -16),) * 2
    assert np.corrcoef(back[core].ravel(), img[core].ravel())[0, 1] > 0.9
    # MLBG shortcut preserves values exactly
    out = orient_data(img, w_rot, mlbg_rot90_flip=True, tel="BG2")
    np.testing.assert_array_equal(out, np.rot90(img, k=-1))
    out_ml = orient_data(img, w_rot, mlbg_rot90_flip=True, tel="ML1")
    np.testing.assert_array_equal(out_ml, np.fliplr(np.rot90(img, k=-1)))


def test_parse_coord_sexagesimal():
    from blackbox_tpu.report.finding_chart import parse_coord

    assert abs(parse_coord("12:30:00", True) - 187.5) < 1e-9
    assert abs(parse_coord("187.5", True) - 187.5) < 1e-9
    assert abs(parse_coord("-10:45:32.3", False)
               - -(10 + 45 / 60 + 32.3 / 3600)) < 1e-9
    assert abs(parse_coord(" -0:30:00", False) - -0.5) < 1e-9


def test_finding_chart_cli_fz_product(tmp_path, monkeypatch):
    """--finding_chart reads a Rice-compressed product end to end."""
    from blackbox_tpu.io.fits import Header
    from blackbox_tpu.io.rice import write_rice
    from blackbox_tpu.__main__ import main

    img = _image_with_star(shape=(256, 256), star=(128.0, 128.0))
    wcs = TanWCS.simple(150.0, -30.0, 1.0, img.shape, rot_deg=8.0)
    h = Header()
    wcs.to_header(h)
    h["DATE-OBS"] = ("2024-01-01T02:03:04", "")
    h["FILTER"] = ("q", "")
    p = str(tmp_path / "ML1_20240101_020304_red.fits.fz")
    write_rice(p, img, h, qlevel=16)

    ra, dec = wcs.pix2sky(128.0, 128.0)
    monkeypatch.chdir(tmp_path)
    rc = main(["--finding_chart", f"{float(ra):.6f}",
               f"{float(dec):.6f}", p,
               "--target_name", "SN test", "--output_format", "png",
               "--size_arcmin", "2"])
    assert rc == 0
    outs = [f for f in os.listdir(tmp_path) if f.endswith("_fc.png")]
    assert outs and os.path.getsize(tmp_path / outs[0]) > 5000
