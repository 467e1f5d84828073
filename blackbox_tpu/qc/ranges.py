"""QC range tables.

Structured like the reference's ``Settings/set_qc.py`` qc_range dictionary
(telescope-keyed, filter-keyed sub-ranges, graded green/yellow/orange
windows) but maintained as framework data.  The set below covers every
keyword this pipeline emits; deployments extend/override it per telescope.

Each entry: {default, val_type, val_range, key_type, comment}.
"""

from __future__ import annotations


def _e(default, val_type, val_range, key_type, comment=""):
    return {"default": default, "val_type": val_type,
            "val_range": val_range, "key_type": key_type,
            "comment": comment}


_BASE = {
    # ---- raw header contract ----
    # the reference has no EXPTIME entry (bias frames carry 0 s); kept
    # as an explicit skip for documentation
    "EXPTIME": _e(0.0, "skip", None, "raw", "[s] exposure time"),
    "ISTRACKI": _e(False, "bool", [True], "raw", "telescope tracking?"),

    # ---- detector calibration ('full') ----
    "RDNOISE": _e(None, "min_max", [(5, 15), (3, 20), (2, 30)], "full",
                  "[e-] average channel read noise"),
    "BIASMEAN": _e(None, "min_max", [(3000, 25000), (1000, 35000),
                                     (0, 60000)], "full",
                   "[e-] average channel bias level"),
    "NCOSMICS": _e(None, "min_max", [(0, 50), (0, 200), (0, 2000)],
                   "full", "[/s] cosmic-ray rate"),
    "NSATS": _e(None, "min_max", [(0, 5), (0, 10), (0, 30)], "full",
                "number of satellite trails"),
    "SATURATE": _e(None, "min_max", [(30000, 200000)], "full",
                   "[e-] mean saturation level"),
    "NOBJ-SAT": _e(None, "min_max", [(0, 1000), (0, 5000), (0, 50000)],
                   "full", "number of saturated objects"),

    # ---- source extraction ('full') ----
    "S-SEEING": _e(None, "min_max", {"u": [(0.5, 4.0), (0.3, 6.0),
                                           (0.2, 10.0)],
                                     "q": [(0.5, 4.0), (0.3, 6.0),
                                           (0.2, 10.0)]}, "full",
                   "[arcsec] seeing"),
    "NOBJECTS": _e(0, "min_max", [(100, 10**7), (10, 10**7), (0, 10**7)],
                   "full", "number of detected sources"),
    "S-BKG": _e(None, "min_max", [(0, 5000), (0, 20000), (-100, 100000)],
                "full", "[e-] median background"),
    "S-BKGSTD": _e(None, "min_max", [(0, 500), (0, 2000), (0, 100000)],
                   "full", "[e-] background STD"),
    "LIMMAG": _e(None, "min_max", {"u": [(18.5, 23.5), (17, 24), (12, 25)],
                                   "g": [(19.5, 24.5), (18, 25), (12, 26)],
                                   "q": [(19.5, 24.5), (18, 25), (12, 26)],
                                   "r": [(19.0, 24.0), (17.5, 25), (12, 26)],
                                   "i": [(18.5, 23.5), (17, 24), (12, 25)],
                                   "z": [(17.5, 22.5), (16, 23), (12, 24)]},
                 "full", "[mag] 5-sigma limiting magnitude"),
    "PC-ZP": _e(None, "min_max", {"u": [(21.5, 23.3), (21, 23.8), (19, 25)],
                                  "g": [(22.5, 24.3), (22, 24.8), (20, 26)],
                                  "q": [(22.8, 24.6), (22.3, 25.1),
                                        (20, 26)],
                                  "r": [(22.0, 23.8), (21.5, 24.3),
                                        (20, 26)],
                                  "i": [(21.4, 23.2), (20.9, 23.7),
                                        (19, 25)],
                                  "z": [(20.5, 22.3), (20, 22.8),
                                        (18, 24)]},
                "full", "[mag] photometric zeropoint"),
    "PC-ZPSTD": _e(None, "min_max", [(0, 0.08), (0, 0.15), (0, 0.5)],
                   "full", "[mag] zeropoint STD over stars"),
    "RADECOFF": _e(None, "min_max", [(0, 0.3), (0, 1.0), (0, 10.0)],
                   "full", "[arcmin] offset vs field grid"),
    "A-PSCALE": _e(None, "exp_frac", [(0.5642, 0.005), (0.5642, 0.02),
                                      (0.5642, 0.1)], "full",
                   "[arcsec/pix] solved pixel scale"),
    "A-ROT": _e(None, "min_max", [(-1.0, 1.0), (-5, 5), (-360, 360)],
                "full", "[deg] solved rotation vs N-up"),

    # ---- master bias ('mbias') ----
    "NBIAS": _e(None, "min_max", [(10, 50), (7, 50), (3, 50)], "mbias",
                "number of bias frames combined"),
    "MBMEAN": _e(None, "min_max", [(-2, 2), (-5, 5), (-20, 20)], "mbias",
                 "[e-] mean master bias"),
    "MBRDN": _e(None, "min_max", [(0, 10), (0, 20), (0, 50)], "mbias",
                "[e-] sigma (STD) master bias"),

    # ---- flats ('flat' / 'mflat') ----
    "MEDSEC": _e(None, "min_max", [(15000, 80000), (10000, 100000),
                                   (2000, 200000)], "flat",
                 "[e-] median flat level in STATSEC"),
    "RSTDSEC": _e(None, "min_max", [(0, 0.03), (0, 0.08), (0, 0.5)],
                  "flat", "relative STD of flat in STATSEC"),
    "FLATRSTD": _e(None, "min_max", [(0, 0.08), (0, 0.15), (0, 0.5)],
                   "flat", "relative STD of flat"),
    "RDIF-MAX": _e(None, "min_max", [(0, 0.06), (0, 0.12), (0, 0.5)],
                   "flat", "max relative difference between subimages"),
    "RSTD-MAX": _e(None, "min_max", [(0, 0.06), (0, 0.12), (0, 0.5)],
                   "flat", "max relative STD of subimages"),
    "NFLAT": _e(None, "min_max", [(6, 50), (4, 50), (3, 50)], "mflat",
                "number of flat frames combined"),

    # ---- transient catalog ('trans') ----
    "T-NTRANS": _e(0, "min_max", [(0, 300), (0, 1500), (0, 10**6)],
                   "trans", "number of transient candidates"),
    "T-FRATIO": _e(None, "min_max", [(0.2, 5.0), (0.05, 20.0),
                                     (0.001, 1000.0)], "trans",
                   "new/ref flux ratio"),
    "Z-DX": _e(None, "min_max", [(-0.3, 0.3), (-1, 1), (-10, 10)],
               "trans", "[pix] x shift new vs ref"),
    "Z-DY": _e(None, "min_max", [(-0.3, 0.3), (-1, 1), (-10, 10)],
               "trans", "[pix] y shift new vs ref"),
    "Z-SCMED": _e(None, "min_max", [(-0.3, 0.3), (-1, 1), (-10, 10)],
                  "trans", "median Scorr"),
    "Z-SCSTD": _e(None, "min_max", [(0.7, 1.5), (0.4, 2.5), (0.1, 10)],
                  "trans", "STD of Scorr"),

    # ---- reference co-add ('ref') ----
    "R-NUSED": _e(None, "min_max", [(3, 40), (2, 60), (1, 100)], "ref",
                  "images used in co-add"),
}


def _per_channel(fmt: str, entry: dict, nchan: int = 16) -> dict:
    """Expand one range entry to per-channel keywords (the reference's
    set_qc.py carries 16 literal entries per quantity — here generated)."""
    out = {}
    for c in range(1, nchan + 1):
        e = dict(entry)
        e["comment"] = f"channel {c} " + e.get("comment", "")
        out[fmt.format(c)] = e
    return out


_BASE.update(_per_channel(
    "BIASM{}", _e(None, "min_max", [(3000, 25000), (1000, 35000),
                                    (0, 60000)], "full",
                  "[e-] mean vertical overscan")))
_BASE.update(_per_channel(
    "RDN{}", _e(None, "min_max", [(5, 15), (3, 20), (2, 30)], "full",
                "[e-] read noise (sigma vertical overscan)")))
_BASE.update(_per_channel(
    "SATLEV{}", _e(None, "min_max", [(30000, 200000)], "full",
                   "[e-] saturation threshold")))
_BASE.update(_per_channel(
    "FLATRS{}", _e(None, "min_max", [(0, 0.05), (0, 0.1), (0, 0.5)],
                   "flat", "relative sigma (STD) flat")))
_BASE.update(_per_channel(
    "MBIASM{}", _e(None, "min_max", [(-2, 2), (-5, 5), (-20, 20)],
                   "mbias", "[e-] mean master bias")))
_BASE.update(_per_channel(
    "MBRDN{}", _e(None, "min_max", [(0, 10), (0, 20), (0, 50)],
                  "mbias", "[e-] sigma (STD) master bias")))
_BASE.update(_per_channel(
    "GAINCF{}", _e(None, "exp_abs", [(1.0, 0.1), (1.0, 0.25), (1.0, 0.6)],
                   "mflat", "gain correction factor")))


QC_RANGES = {
    "ML1": _BASE,
    # BlackGEM telescopes share the base with small deviations
    "BG": {**_BASE,
           "RDNOISE": _e(None, "min_max", [(5, 13), (3, 18), (2, 30)],
                         "full", "[e-] average channel read noise")},
}
