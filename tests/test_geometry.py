import numpy as np

from blackbox_tpu.core.geometry import CCDGeometry, TINY


def test_shapes():
    g = TINY
    assert g.raw_shape == (g.ny * (g.ysize_chan + g.ysize_os),
                           g.nx * (g.xsize_chan + g.xsize_os))
    assert g.red_shape == (g.ny * g.ysize_chan, g.nx * g.xsize_chan)
    assert g.n_chan == 16


def test_split_matches_slices(rng):
    g = TINY
    raw = rng.normal(size=g.raw_shape).astype(np.float32)
    chan_data, os_vert, os_hori = g.split_raw(raw)
    assert chan_data.shape == g.chan_shape
    assert os_vert.shape == (g.n_chan, g.dy, g.os_vert_width)
    assert os_hori.shape == (g.n_chan, g.os_hori_height, g.dx)
    for c in range(g.n_chan):
        np.testing.assert_array_equal(chan_data[c], raw[g.data_sec[c]])
        np.testing.assert_array_equal(os_vert[c], raw[g.os_sec_vert[c]])
        np.testing.assert_array_equal(os_hori[c], raw[g.os_sec_hori[c]])


def test_assemble_roundtrip(rng):
    g = TINY
    stack = rng.normal(size=g.chan_shape).astype(np.float32)
    mosaic = g.assemble(stack)
    assert mosaic.shape == g.red_shape
    np.testing.assert_array_equal(g.disassemble(mosaic), stack)
    # mosaic placement agrees with the reduced slice table
    for c in range(g.n_chan):
        np.testing.assert_array_equal(mosaic[g.data_sec_red[c]], stack[c])


def test_meerlicht_reduced_is_10560():
    g = CCDGeometry()
    assert g.red_shape == (10560, 10560)
