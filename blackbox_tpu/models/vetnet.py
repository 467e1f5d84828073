"""VetNet: real/bogus transient classification (MeerCRAB equivalent).

The reference scores every transient candidate with the external
MeerCRAB CNN (`ML_calc_prob` in set_zogy; the `MC-P` QC keyword,
/root/reference/Settings/set_qc.py:129): a small convnet over the
NEW/REF/D/SCORR cutout stack returns P(real).  Same contract here as a
flax CNN over (N, S, S, 4) cutout stacks, with a synthetic training
loop (real = PSF-shaped residual in D/SCORR; bogus = cosmic spikes,
dipoles from registration error, hot columns, noise flukes) so the
framework is self-contained without MeerCRAB's weight files.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class VetNet(nn.Module):
    """Small CNN: (B, S, S, 4) cutouts -> logit of P(real)."""

    feats: tuple = (16, 32, 64)

    @nn.compact
    def __call__(self, x):
        for f in self.feats:
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        x = nn.relu(nn.Dense(32)(x))
        return nn.Dense(1)(x)[..., 0]


STAMP = 32

# Default CLASS_REAL cut.  The synthetic injection campaign
# (docs/OPERATING_CURVES.md, tools/operating_curves.py) measures
# purity 1.000 at EVERY cut on synthetic bogus — the curve cannot
# place an upper threshold — so the default stays the conventional
# MeerCRAB operating point (0.5), keeping real-sky margin against
# bogus classes the generator does not model.  Completeness on the
# hard faint-amplitude held-out set at 0.5: 0.78 overall, 1.00 at
# >= 8 sigma.  The driver stores the full CLASS_REAL column like the
# reference stores MeerCRAB probabilities (set_qc.py:129 MC-P), so
# consumers can always re-cut.
RECOMMENDED_THRESHOLD = 0.5


def _norm(c):
    med = jnp.median(c, axis=(1, 2), keepdims=True)
    mad = jnp.median(jnp.abs(c - med), axis=(1, 2),
                     keepdims=True) * 1.4826 + 1e-6
    return jnp.clip((c - med) / mad, -10.0, 10.0) / 10.0


def make_stamps(new_img, ref_img, D, scorr, xs, ys, stamp: int = STAMP):
    """(N, S, S, 4) normalised cutout stacks around candidates."""
    H, W = D.shape
    half = stamp // 2
    x0 = jnp.clip(jnp.round(xs).astype(jnp.int32) - half, 0, W - stamp)
    y0 = jnp.clip(jnp.round(ys).astype(jnp.int32) - half, 0, H - stamp)

    def cuts(img):
        def one(y0i, x0i):
            return jax.lax.dynamic_slice(img, (y0i, x0i), (stamp, stamp))
        return _norm(jax.vmap(one)(y0, x0))

    return jnp.stack([cuts(new_img), cuts(ref_img), cuts(D),
                      cuts(scorr)], axis=-1)


def score_transients(params, new_img, ref_img, D, scorr, xs, ys,
                     stamp: int = STAMP):
    """P(real) per candidate — the MC-P column."""
    stamps = make_stamps(new_img, ref_img, D, scorr, xs, ys, stamp)
    return jax.nn.sigmoid(VetNet().apply(params, stamps))


def init_params(key, stamp: int = STAMP):
    return VetNet().init(key, jnp.zeros((1, stamp, stamp, 4)))


# ----------------------------------------------------------- training

def _gauss(size, x, y, fwhm, amp):
    s = fwhm / 2.355
    g = np.arange(size)
    return amp * np.exp(-0.5 * (((g[None, :] - x) / s) ** 2
                                + ((g[:, None] - y) / s) ** 2))


def synth_batch(rng: np.random.Generator, n: int, stamp: int = STAMP):
    """Synthetic (stamps, labels): real transients vs artefact classes."""
    X = np.zeros((n, stamp, stamp, 4), np.float32)
    y = np.zeros(n, np.float32)
    c = stamp / 2
    for i in range(n):
        fwhm = rng.uniform(2.2, 4.5)
        noise = lambda s=1.0: rng.normal(0, s, (stamp, stamp))  # noqa
        ref = noise() + _gauss(stamp, *rng.uniform(4, stamp - 4, 2),
                               fwhm, rng.uniform(0, 30))
        new = ref + noise()
        kind = rng.integers(0, 5)
        if kind == 0:                       # REAL: PSF-shaped in new+D
            amp = rng.uniform(6, 60)
            dx, dy = rng.uniform(-1, 1, 2)
            src = _gauss(stamp, c + dx, c + dy, fwhm, amp)
            new = new + src
            D = src + noise()
            S = src / max(amp, 1) * rng.uniform(6, 25) + noise()
            y[i] = 1.0
        elif kind == 1:                     # cosmic spike: 1-2 px, sharp
            D = noise()
            S = noise()
            xi, yi = rng.integers(stamp // 2 - 2, stamp // 2 + 3, 2)
            for img in (new, D, S):
                img[yi, xi] += rng.uniform(20, 200)
        elif kind == 2:                     # dipole (registration error)
            amp = rng.uniform(10, 60)
            off = rng.uniform(0.6, 1.6)
            pos = _gauss(stamp, c - off, c, fwhm, amp)
            neg = _gauss(stamp, c + off, c, fwhm, amp)
            D = pos - neg + noise()
            S = (pos - neg) / 3.0 + noise()
            new = new + pos - neg
        elif kind == 3:                     # hot column / streak
            D = noise()
            S = noise()
            col = rng.integers(stamp // 2 - 2, stamp // 2 + 3)
            for img in (new, D, S):
                img[:, col] += rng.uniform(5, 40)
        else:                               # pure noise fluke
            D = noise()
            S = noise()
            S[stamp // 2, stamp // 2] += rng.uniform(5, 8)
        X[i, :, :, 0] = new
        X[i, :, :, 1] = ref
        X[i, :, :, 2] = D
        X[i, :, :, 3] = S
    return X, y


def train(steps: int = 400, batch: int = 32, lr: float = 1e-3,
          seed: int = 0, stamp: int = STAMP, log_every: int = 100):
    import optax

    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(seed), stamp)
    opt = optax.adam(lr)
    state = opt.init(params)
    model = VetNet()

    @jax.jit
    def step(params, state, x, y):
        def loss_fn(p):
            logits = model.apply(p, _norm_batch(x))
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state2 = opt.update(grads, state)
        return optax.apply_updates(params, updates), state2, loss

    def _norm_batch(x):
        med = jnp.median(x, axis=(1, 2), keepdims=True)
        mad = jnp.median(jnp.abs(x - med), axis=(1, 2),
                         keepdims=True) * 1.4826 + 1e-6
        return jnp.clip((x - med) / mad, -10.0, 10.0) / 10.0

    for i in range(steps):
        x, yv = synth_batch(rng, batch, stamp)
        params, state, loss = step(params, state, jnp.asarray(x),
                                   jnp.asarray(yv))
        if log_every and i % log_every == 0:
            print(f"vetnet step {i}: loss {float(loss):.4f}")
    return params


def save_params(path: str, params):
    from flax import serialization
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(params))


def load_params(path: str, stamp: int = STAMP):
    from flax import serialization
    template = init_params(jax.random.PRNGKey(0), stamp)
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())
