import numpy as np
import jax.numpy as jnp

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.coadd import (
    ClipParams, clipped_coadd, weighted_coadd, coadd_mask, coadd_bkg_std,
    a_swarp_search)
from blackbox_tpu.pipeline.buildref import (
    BuildRefSettings, RefInput, select_images, coadd_field)
from blackbox_tpu.synth.generator import star_image


def test_weighted_coadd_depth(rng):
    # N images of pure noise: co-add STD shrinks by sqrt(N)
    N, H, W = 9, 64, 64
    sig = 10.0
    stack = jnp.asarray(rng.normal(0, sig, (N, H, W)).astype(np.float32))
    w = jnp.full((N, H, W), 1.0 / sig ** 2)
    co, wsum = weighted_coadd(stack, w)
    assert abs(float(jnp.std(co)) - sig / 3.0) < 0.3
    std = coadd_bkg_std(wsum)
    assert np.allclose(np.asarray(std), sig / 3.0, atol=1e-4)


def test_clipped_coadd_rejects_outliers(rng):
    N, H, W = 7, 64, 64
    sig = 5.0
    stack = rng.normal(0, sig, (N, H, W)).astype(np.float32)
    # a "cosmic" slab in image 3 and a "satellite" row in image 5
    stack[3, 20:24, 30:34] += 500.0
    stack[5, 40, :] += 300.0
    w = np.full((N, H, W), 1.0 / sig ** 2, np.float32)
    co, wsum, nclip = clipped_coadd(
        jnp.asarray(stack), jnp.asarray(w),
        jnp.full((N,), sig, jnp.float32), ClipParams(A=0.3, nsigma=3.0))
    co = np.asarray(co)
    assert abs(co[22, 32]) < 5 * sig / np.sqrt(N - 1)
    assert abs(co[40, 10]) < 5 * sig / np.sqrt(N - 1)
    assert int(np.asarray(nclip)[22, 32]) == 1
    # clean pixels: almost nothing clipped
    assert np.asarray(nclip)[:15, :15].mean() < 0.2


def test_clipped_coadd_protects_star_core(rng):
    # a real star present in ALL images with PSF mismatch must NOT be
    # clipped away (Gruen protection via the A-term + core protection)
    N, H, W = 8, 96, 96
    sig = 5.0
    stack = []
    for i in range(N):
        fwhm = 2.5 + 0.3 * (i % 3)
        img = star_image((H, W), [[48.0, 48.0, 3e4, fwhm]]) \
            + rng.normal(0, sig, (H, W))
        stack.append(img.astype(np.float32))
    stack = np.stack(stack)
    w = np.full((N, H, W), 1.0 / sig ** 2, np.float32)
    co, wsum, nclip = clipped_coadd(
        jnp.asarray(stack), jnp.asarray(w),
        jnp.full((N,), sig, jnp.float32), ClipParams(A=0.3, nsigma=3.0))
    flux_co = float(np.asarray(co)[40:57, 40:57].sum())
    flux_mean = stack[:, 40:57, 40:57].sum(axis=(1, 2)).mean()
    assert abs(flux_co / flux_mean - 1.0) < 0.05


def test_coadd_mask_votes():
    N, H, W = 4, 16, 16
    m = np.zeros((N, H, W), np.uint8)
    m[:, 0, :] = maskbits.EDGE                 # off-frame in all -> EDGE
    m[0, 5, 5] = maskbits.COSMIC               # 1/4 -> dropped (vote)
    m[:3, 6, 6] = maskbits.BAD                 # 3/4 -> kept
    m[1, 7, 7] = maskbits.SATURATED            # OR bit -> kept
    m[2:, 8, :] = maskbits.EDGE                # 2/4 contribute -> no EDGE
    out = np.asarray(coadd_mask(jnp.asarray(m)))
    assert (out[0, :] & maskbits.EDGE).all()
    assert out[5, 5] == 0
    assert out[6, 6] & maskbits.BAD
    assert out[7, 7] & maskbits.SATURATED
    assert not (out[8, 3] & maskbits.EDGE)


def test_a_swarp_search_grid():
    rng = np.random.default_rng(3)
    S = 25
    base = star_image((S, S), [[12, 12, 1.0, 3.0]]).astype(np.float64)
    base /= base.sum()
    stamps = np.stack([base + rng.normal(0, 1e-5, (S, S))
                       for _ in range(10)])
    A, ns, nout, nkept = a_swarp_search(stamps, np.ones(10, bool))
    assert 0.3 <= A <= 5.1 and ns in (2.5, 3.0, 3.5)
    assert nkept >= 7
    # identical stamps -> smallest A works immediately
    A2, ns2, _, _ = a_swarp_search(np.stack([base] * 10),
                                   np.ones(10, bool))
    assert A2 == 0.3


def test_select_images_depth_logic():
    table = []
    for i in range(30):
        table.append({"QC-FLAG": "green" if i % 7 else "orange",
                      "S-SEEING": 2.0 + 0.05 * (i % 5),
                      "LIMMAG": 20.0 + 0.05 * i, "idx": i})
    s = BuildRefSettings(limmag_target=21.5, nimages_min=3, nimages_max=10)
    sel, info = select_images(table, s)
    assert 3 <= info["nsel"] <= 10
    # deepest images selected first
    lims = [r["LIMMAG"] for r in sel]
    assert lims == sorted(lims, reverse=True)
    assert info["limmag_proj"] > max(lims)      # co-add deeper than best
    # red rows never selected (reference default applies no
    # qc_flag_max cut; red frames carry no usable catalogs)
    assert all(r["QC-FLAG"] != "red" for r in sel)


def test_select_images_tracking_cut():
    # the reference keeps only ISTRACKI == True rows (buildref.py:401);
    # regression for the round-1 inversion that rejected every tracked
    # frame
    table = []
    for i in range(12):
        table.append({"QC-FLAG": "green", "S-SEEING": 2.0,
                      "LIMMAG": 20.0 + 0.01 * i,
                      "ISTRACKI": (i % 3 != 0), "idx": i})
    sel, info = select_images(table, BuildRefSettings(nimages_min=1))
    assert info["nsel"] > 0
    assert all(r["ISTRACKI"] for r in sel)
    # rows without the column are assumed tracking
    sel2, info2 = select_images(
        [{"QC-FLAG": "green", "S-SEEING": 2.0, "LIMMAG": 20.0}],
        BuildRefSettings(nimages_min=1))
    assert info2["nsel"] == 1


def test_coadd_field_end_to_end(rng):
    H = W = 128
    wcs_out = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    sky_std = 4.0
    star = [[64.0, 64.0, 2.0e4, 3.0]]
    inputs = []
    for i in range(5):
        w_i = TanWCS.simple(150.0 + 1e-4 * i, -30.0 - 5e-5 * i,
                            0.5642, (H, W), rot_deg=0.5 * i)
        ra, dec = wcs_out.pix2sky(64.0, 64.0)
        xi, yi = w_i.sky2pix(ra, dec)
        zp_i = 25.0 - 0.1 * i
        # image in its own flux units: truth flux / 10^(0.4(zp_ref-zp_i))
        fs = 10.0 ** (0.4 * (25.0 - zp_i))
        img = star_image((H, W), [[float(xi), float(yi),
                                   2.0e4 / fs, 3.0]])
        img = (img + rng.normal(0, sky_std, (H, W))).astype(np.float32)
        mask = np.zeros((H, W), np.uint8)
        if i == 2:       # a masked blob that must not reach the co-add
            img[30:34, 30:34] += 1e4
            mask[30:34, 30:34] = maskbits.COSMIC
        inputs.append(RefInput(
            image=jnp.asarray(img),
            bkg_std=jnp.full((H, W), sky_std, jnp.float32),
            mask=jnp.asarray(mask), wcs=w_i, zp=zp_i))

    out = coadd_field(inputs, wcs_out, (H, W))
    co = np.asarray(out["image"])
    # star flux recovered at the common zeropoint scale (zp_ref = 25)
    flux = co[52:77, 52:77].sum()
    assert abs(flux / 2.0e4 - 1.0) < 0.03, flux
    # masked blob absent
    assert abs(co[31, 31]) < 6 * sky_std
    # co-add noise < single-image noise
    assert np.std(co[90:120, 90:120]) < 0.6 * sky_std
    # mask mostly clear inside, EDGE at the rotated-out corners
    assert np.asarray(out["mask"])[64, 64] == 0


def test_blocked_coadd_matches_resident(rng):
    """coadd_field_blocked == coadd_field (same remap/clip math) when
    every contribution fits the slab."""
    from blackbox_tpu.pipeline.buildref import coadd_field_blocked

    H = W = 128
    wcs_out = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    sky_std = 4.0
    inputs = []
    for i in range(5):
        w_i = TanWCS.simple(150.0 + 1e-4 * i, -30.0 - 5e-5 * i,
                            0.5642, (H, W), rot_deg=0.5 * i)
        ra, dec = wcs_out.pix2sky(64.0, 64.0)
        xi, yi = w_i.sky2pix(ra, dec)
        zp_i = 25.0 - 0.1 * i
        fs = 10.0 ** (0.4 * (25.0 - zp_i))
        img = star_image((H, W), [[float(xi), float(yi), 2.0e4 / fs, 3.0]])
        img = (img + rng.normal(0, sky_std, (H, W))).astype(np.float32)
        mask = np.zeros((H, W), np.uint8)
        # a saturated footprint just inside block 1 (block_rows=32): its
        # clip-protection zone crosses the block seam, which the blocked
        # path must honour via its halo (review regression)
        from blackbox_tpu.core import maskbits as mb
        mask[27:30, 60:63] = mb.SATURATED
        if i == 1:
            # outlier in the NEXT block within the protection radius:
            # protected (unclipped) in both paths or parity breaks
            img[38, 61] += 40.0 * sky_std
        inputs.append(RefInput(
            image=jnp.asarray(img),
            bkg_std=jnp.full((H, W), sky_std, jnp.float32),
            mask=jnp.asarray(mask), wcs=w_i, zp=zp_i))

    res = coadd_field(inputs, wcs_out, (H, W))
    blk = coadd_field_blocked(inputs, wcs_out, (H, W), block_rows=32,
                              pad_rows=16)
    # different XLA programs round borderline clip residuals
    # differently: a handful of near-threshold pixels may flip their
    # clip decision — everything else must match exactly
    flip = blk["nclipped"] != np.asarray(res["nclipped"])
    assert flip.mean() < 1e-3, flip.sum()
    same = ~flip
    d = np.abs(blk["image"] - np.asarray(res["image"]))
    # f32 device-grid upsampling shifts coordinates by ~1e-4 px, and
    # the (round-5) shift2pass remap sums its taps in a different
    # order between the slab-fed blocked call and the full-frame
    # resident call (union vs per-input static ranges): the combined
    # value differences stay under ~1% of the sky noise, concentrated
    # on the star's steep gradient
    assert d[same].max() < 0.05, d[same].max()
    assert np.allclose(blk["wsum"][same], np.asarray(res["wsum"])[same],
                       atol=1e-5)
    assert np.array_equal(blk["mask"], np.asarray(res["mask"]))
    assert abs(blk["zp"] - res["zp"]) < 1e-9


def test_clip_protection_per_star(rng):
    # varying-seeing stack: EVERY saturated star's core must stay
    # unclipped while a cosmic in the same stack is clipped
    # (reference pass_filters protects <=5xFWHM, buildref.py:3702-3870)
    from blackbox_tpu.ops.coadd import (ClipParams, clipped_coadd,
                                        saturation_protect)
    from blackbox_tpu.core import maskbits as mb
    H = W = 96
    N = 6
    # two bright stars of different peaks at (30,30) and (70,64)
    stars_pos = [(30, 30), (70, 64)]
    stack = []
    for i in range(N):
        fwhm = 2.0 + 0.6 * i                 # strongly varying seeing
        img = star_image((H, W), [[x, y, 5e4 * (1 + (x == 30)), fwhm]
                                  for (y, x) in stars_pos])
        img += rng.normal(0, 5.0, (H, W))
        stack.append(img.astype(np.float32))
    stack = jnp.asarray(np.stack(stack))
    # cosmic hit in image 2 away from the stars
    stack = stack.at[2, 10, 80].add(5000.0)
    w = jnp.ones((N, H, W), jnp.float32)
    sig = jnp.full((N,), 5.0, jnp.float32)

    masks = np.zeros((N, H, W), np.uint8)
    for (y, x) in stars_pos:
        masks[:, y, x] = mb.SATURATED
    protect = saturation_protect(jnp.asarray(masks), radius_pix=15)
    p = ClipParams(A=0.3, nsigma=2.5, nmin_clip=3)
    co, wsum, nclip = clipped_coadd(stack, w, sig, p, protect=protect)
    nclip = np.asarray(nclip)
    # the cosmic is clipped
    assert nclip[10, 80] >= 1
    # NO clipping within the protection radius of either star
    yy, xx = np.mgrid[:H, :W]
    for (y, x) in stars_pos:
        near = (np.abs(yy - y) <= 15) & (np.abs(xx - x) <= 15)
        assert nclip[near].sum() == 0, (y, x)
    # without protection, the varying-seeing star cores DO get clipped
    # (the failure mode the protection exists to prevent)
    _, _, nclip0 = clipped_coadd(stack, w, sig, p, protect=None)
    nclip0 = np.asarray(nclip0)
    assert sum(nclip0[(np.abs(yy - y) <= 8) & (np.abs(xx - x) <= 8)].sum()
               for (y, x) in stars_pos) > 0


def test_blocked_coadd_mini_std_parity(rng):
    """The device-side mini->std slab reconstruction is bit-identical
    to streaming pre-upsampled full-res std planes (matmul rows are
    independent), so the transfer-lean path changes nothing."""
    from blackbox_tpu.ops.background import mini2back
    from blackbox_tpu.pipeline.buildref import coadd_field_blocked
    import dataclasses as dc

    H = W = 128
    box = 32
    wcs_out = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    inputs_full, inputs_mini = [], []
    for i in range(4):
        w_i = TanWCS.simple(150.0 + 1e-4 * i, -30.0 - 5e-5 * i,
                            0.5642, (H, W), rot_deg=0.4 * i)
        img = rng.normal(0, 4.0, (H, W)).astype(np.float32)
        mask = np.zeros((H, W), np.uint8)
        stdm = (4.0 + 0.5 * rng.random((H // box, W // box))
                ).astype(np.float32)
        bstd = jnp.asarray(mini2back(jnp.asarray(stdm), (H, W), box))
        base = RefInput(image=jnp.asarray(img), bkg_std=bstd,
                        mask=jnp.asarray(mask), wcs=w_i, zp=25.0)
        inputs_full.append(base)
        inputs_mini.append(dc.replace(base, bkg_std_mini=stdm,
                                      bkg_boxsize=box))

    a = coadd_field_blocked(inputs_full, wcs_out, (H, W),
                            block_rows=32, pad_rows=16)
    b = coadd_field_blocked(inputs_mini, wcs_out, (H, W),
                            block_rows=32, pad_rows=16)
    for key in ("image", "wsum", "nclipped", "mask", "bkg_std"):
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]), err_msg=key)


def test_blocked_coadd_instrumented(rng):
    """instrument=True returns the per-stage wall breakdown (the
    round-5 measurement hook) without changing the outputs."""
    from blackbox_tpu.pipeline.buildref import coadd_field_blocked

    H = W = 96
    wcs_out = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    inputs = []
    for i in range(3):
        w_i = TanWCS.simple(150.0 + 1e-5 * i, -30.0, 0.5642, (H, W))
        img = rng.normal(0, 4.0, (H, W)).astype(np.float32)
        inputs.append(RefInput(
            image=jnp.asarray(img),
            bkg_std=jnp.full((H, W), 4.0, jnp.float32),
            mask=jnp.asarray(np.zeros((H, W), np.uint8)),
            wcs=w_i, zp=25.0))
    a = coadd_field_blocked(inputs, wcs_out, (H, W), block_rows=48,
                            pad_rows=8)
    b = coadd_field_blocked(inputs, wcs_out, (H, W), block_rows=48,
                            pad_rows=8, instrument=True)
    tim = b["timings"]
    assert tim["nblocks"] == 2
    assert all(k in tim for k in
               ("prep_s", "upload_s", "compute_s", "drain_s"))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["nclipped"], b["nclipped"])
