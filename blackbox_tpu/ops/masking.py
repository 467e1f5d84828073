"""Initial mask construction (bad pixels, saturation, crosstalk victims).

Behavioural rebuild of the reference's ``mask_init`` / ``fill_sat_holes``
(/root/reference/blackbox.py:4375-4596):

* non-finite pixels -> zeroed and flagged ``bad``;
* per-channel saturation threshold ``satlevel_adu * gain - BIASM`` [e-];
* crosstalk-victim flagging: the saturation footprint of each source
  channel is stamped into all other channels (y-flipped across readout
  rows) — in channel-stack form this is a broadcast OR over the channel
  axis instead of a 16x16 double loop;
* saturated-connected pixels by one 3x3 dilation, then closing + hole fill
  of the combined blob.

Everything operates on the (C, ych, xch) stack; the mosaic never needs to
be materialised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.morphology import satcon_close_fill


def build_mask(chan_data, bpm, satlevel_adu, gains, biasm, nx: int = 8,
               fill_iters: int = 1):
    """Build the initial uint8 mask stack and clean the data stack.

    chan_data   : (C, ych, xch) calibrated data [e-]
    bpm         : (C, ych, xch) uint8 static bad-pixel mask (bad|edge bits)
                  or None
    satlevel_adu: (C,) raw-ADU saturation levels
    gains       : (C,) e-/ADU
    biasm       : (C,) mean vertical-overscan level [e-] (BIASM1..16)

    Returns (chan_data, mask, stats) with stats carrying SATLEV1..16, the
    mean SATURATE level, and the saturated-pixel mask for host-side object
    counting.
    """
    C = chan_data.shape[0]
    if bpm is None:
        mask = jnp.zeros(chan_data.shape, jnp.uint8)
    else:
        mask = jnp.asarray(bpm, jnp.uint8)

    # non-finite -> bad
    nonfinite = ~jnp.isfinite(chan_data)
    chan_data = jnp.where(nonfinite, 0.0, chan_data)
    mask = jnp.where(nonfinite & (mask == 0),
                     mask | maskbits.BAD, mask)

    # per-channel saturation threshold in e-
    satlevel_e = (jnp.asarray(satlevel_adu, jnp.float32)
                  * jnp.asarray(gains, jnp.float32) - biasm)      # (C,)
    mask_sat = chan_data >= satlevel_e[:, None, None]

    # crosstalk victims: each source channel's saturation footprint is
    # stamped into all other channels, y-flipped when the readout rows
    # differ.  DENSE bool-stack union on purpose: a bit-packed variant
    # (once/twice carry scan over uint32 words) measures 6.4 vs 9.3 ms
    # for the words-only chain, but a MATERIALISED full-stack word
    # array costs ~26 ns/element to relayout on v5e (pack 2.9 s,
    # unpack 0.9 s — the (.., 42)-minor u32 layout); packing only pays
    # when it stays fused inside one consumer chain, as in
    # satcon_close_fill below.
    sat_f = mask_sat
    sat_flip = mask_sat[:, ::-1, :]
    bot, top = sat_f[:nx], sat_f[nx:]
    any_bot_fl = jnp.any(sat_flip[:nx], axis=0)
    any_top_fl = jnp.any(sat_flip[nx:], axis=0)
    # victims in bottom row: same-row sources (excluding self) OR flipped
    # top-row sources; "excluding self" = union minus own footprint where
    # only self saturates -> reference stamps only OTHER channels, so
    # subtract own contribution exactly:
    vict_bot = (_union_excl_self(bot) | any_top_fl[None])          # (nx,...)
    vict_top = (_union_excl_self(top) | any_bot_fl[None])
    victims = jnp.concatenate([vict_bot, vict_top], axis=0)
    mask = jnp.where(victims, mask | maskbits.CROSSTALK, mask)

    mask = jnp.where(mask_sat, mask | maskbits.SATURATED, mask)

    # saturated-connected ring + close/fill of the blob, fused into one
    # packed morphology round trip (bit-identical to the separate
    # dilation/closing/fill calls; ops.morphology.satcon_close_fill)
    satcon_add, filled = jax.vmap(
        lambda m: satcon_close_fill(m, fill_iters))(mask_sat)
    mask = jnp.where(satcon_add, mask | maskbits.SAT_CONNECTED, mask)
    add = filled & (mask == 0)
    mask = jnp.where(add, jnp.uint8(maskbits.SAT_CONNECTED), mask)

    stats = {
        "satlev": satlevel_e,                 # (C,) SATLEV1..16 [e-]
        "saturate": jnp.mean(satlevel_e),     # SATURATE
        "mask_sat": mask_sat,                 # for NOBJ-SAT counting
        "n_infnan": jnp.sum(nonfinite),       # N-INFNAN
    }
    return chan_data, mask, stats


def _union_excl_self(stack):
    """OR over the leading axis, excluding each element itself.

    For boolean stacks: pixel is True for channel c iff any OTHER channel
    is True there.  Computed as (count - self) > 0 to stay one-pass.
    """
    cnt = jnp.sum(stack, axis=0, dtype=jnp.int32)
    return (cnt - stack.astype(jnp.int32)) > 0


def mask_counts(mask):
    """Per-bit pixel counts for the M-*NUM mask-header keys (device)."""
    out = {}
    for name, bit in maskbits.BITS.items():
        out[name] = jnp.sum((mask & bit) == bit)
    return out
