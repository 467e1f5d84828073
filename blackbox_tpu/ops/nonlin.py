"""Non-linearity correction.

The reference applies a pickled per-channel spline of the relative
correction ``(data - lin)/lin`` to ADU values below 50k
(/root/reference/blackbox.py:7394-7437, off by default via
``correct_nonlin``).  Here the per-channel correction curve is a
polynomial in ADU (splines with fixed knots reduce to this on device);
coefficients come from the calibration store.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackbox_tpu.ops.polyfit import polyval_norm


def nonlin_correct(chan_data, gains, coeffs, adu_max: float = 50000.0):
    """Apply the relative non-linearity correction per channel.

    chan_data : (C, ych, xch) [e-]
    gains     : (C,) e-/ADU (to evaluate the curve in ADU)
    coeffs    : (C, D) polynomial coefficients of the fractional
                correction over the normalised ADU domain [0, adu_max]

    data_corrected = data / (1 + frac(data_adu)) below the ADU cap.
    """
    g = jnp.asarray(gains, chan_data.dtype)[:, None, None]
    adu = chan_data / g
    C = chan_data.shape[0]
    flat = adu.reshape(C, -1)
    frac = polyval_norm(coeffs, flat, 0.0, adu_max).reshape(chan_data.shape)
    corr = chan_data / (1.0 + frac)
    return jnp.where(adu < adu_max, corr, chan_data)
