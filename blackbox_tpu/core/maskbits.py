"""Mask bit definitions.

Values match the reference's ``set_zogy.mask_value`` contract (consumed at
/root/reference/blackbox.py:4128,4349 and Settings/set_buildref.py:56-58) so
mask FITS products are drop-in compatible.
"""

from __future__ import annotations

BAD = 1            # static bad pixel (from the bad-pixel-mask file) / non-finite
COSMIC = 2         # cosmic ray (L.A.Cosmic)
SATURATED = 4      # above the per-channel saturation threshold
SAT_CONNECTED = 8  # connected to a saturated pixel (bleed/halo)
SATELLITE = 16     # satellite trail
EDGE = 32          # detector edge / no data
CROSSTALK = 64     # crosstalk victim of a saturated source channel

ALL = BAD | COSMIC | SATURATED | SAT_CONNECTED | SATELLITE | EDGE | CROSSTALK

# default sum of bits discarded in co-addition (set_buildref.py:56-58)
DISCARD_DEFAULT = 63

# name -> bit, in header-reporting order (M-BP/CRP/SP/SCP/STP/EP counts,
# reference mask_header blackbox.py:4601-4620)
BITS = {
    "bad": BAD,
    "cosmic": COSMIC,
    "saturated": SATURATED,
    "saturated-connected": SAT_CONNECTED,
    "satellite": SATELLITE,
    "edge": EDGE,
    "crosstalk": CROSSTALK,
}

# header keyword per bit, matching the reference's mask_header keys
HEADER_KEYS = {
    "bad": ("M-BP", "M-NBP"),
    "cosmic": ("M-CRP", "M-NCR"),
    "saturated": ("M-SP", "M-NSP"),
    "saturated-connected": ("M-SCP", "M-NSCP"),
    "satellite": ("M-STP", "M-NSTP"),
    "edge": ("M-EP", "M-NEP"),
}
