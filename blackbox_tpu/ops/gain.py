"""Per-channel gain correction (ADU -> e-).

Reference: ``gain_corr`` /root/reference/blackbox.py:7442-7474 — multiplies
every channel section (including overscans) by the measured e-/ADU gain.
Here the frame is already a channel stack, so this is one broadcast multiply
per stack.
"""

from __future__ import annotations

import jax.numpy as jnp


def gain_correct(chan_data, os_vert, os_hori, gains):
    """Multiply the channel stacks by per-channel gains.

    gains : (C,) e-/ADU.  Returns the three corrected stacks plus the
    per-channel gains for the GAIN1..GAIN16 header keys.
    """
    g = jnp.asarray(gains, chan_data.dtype)[:, None, None]
    return chan_data * g, os_vert * g, os_hori * g
