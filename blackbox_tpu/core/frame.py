"""Frame pytrees — the on-device data model.

A frame moves through the pipeline in two device layouts:

* ``RawFrame``: channel stacks straight off the detector —
  ``chan_data (C, ych, xch)`` plus the usable overscan strips.  All
  calibration ops are vmapped/batched over the leading channel axis.
* ``Frame``: the reduced science product — a single mosaic ``image`` with a
  ``mask`` (uint8 bit flags, :mod:`blackbox_tpu.core.maskbits`) and a
  ``bkg_std`` noise map once background estimation ran.

Headers stay host-side python dicts (the FITS header is the pipeline's
metrics store, reference SURVEY §5.5); device code returns plain dicts of
scalars that the host merges into the header.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RawFrame:
    chan_data: Any         # (C, ych, xch) float32, ADU
    os_vert: Any           # (C, dy, w_v)  float32
    os_hori: Any           # (C, h_h, dx)  float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Frame:
    image: Any                        # (H, W) float32, e-
    mask: Any                         # (H, W) uint8 bit flags
    bkg: Optional[Any] = None         # (H, W) float32 background model
    bkg_std: Optional[Any] = None     # (H, W) float32 background STD
