"""TrailNet: U-Net satellite-trail segmentation (ASTA equivalent).

The reference's default trail detector is the ASTA keras U-Net
(/root/reference/blackbox.py:67, 4090-4158; model file
Settings/set_blackbox.py:222-228): binned image in, per-pixel trail
probability out, mask via threshold + area filtering.  This is the
flax/JAX equivalent with the same interface contract — ASTA weights can
be ported layer-by-layer (same encoder/decoder topology: conv-conv-pool
x4 down, transpose-conv skip-concat x4 up) — plus a synthetic-training
entry point so the framework is self-contained without the reference's
weight file.

Inference runs on device inside the reduce program when
``ReduceContext.use_trailnet`` is enabled; the Radon detector
(:mod:`blackbox_tpu.ops.satdet`) remains the dependency-free default.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBlock(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.feats, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class TrailUNet(nn.Module):
    """Small U-Net: logits of per-pixel trail probability."""

    feats: Sequence[int] = (16, 32, 64)

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1), H/W divisible by 2^(len(feats)-1)
        skips = []
        for f in self.feats[:-1]:
            x = ConvBlock(f)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.feats[-1])(x)
        for f, skip in zip(reversed(self.feats[:-1]), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(f)(x)
        return nn.Conv(1, (1, 1))(x)[..., 0]      # logits (B, H, W)


@dataclasses.dataclass
class TrailNetConfig:
    bin_factor: int = 4
    tile: int = 256              # inference tile size (binned pixels)
    threshold: float = 0.5
    min_area: int = 40           # binned pixels (ASTA area_threshold)


def _normalise(tile):
    med = jnp.median(tile)
    mad = jnp.median(jnp.abs(tile - med)) * 1.4826 + 1e-6
    return jnp.clip((tile - med) / mad, -5.0, 25.0) / 25.0


def segment_trails(params, image, cfg: TrailNetConfig = TrailNetConfig()):
    """Full-frame trail mask via tiled U-Net inference.

    image : (H, W) calibrated frame.  Returns (mask bool (H, W), n_pix).
    """
    from blackbox_tpu.ops.satdet import _bin2d

    model = TrailUNet()
    B = _bin2d(image, cfg.bin_factor)
    Hb, Wb = B.shape
    T = cfg.tile
    ny = -(-Hb // T)
    nx = -(-Wb // T)
    Bp = jnp.pad(B, ((0, ny * T - Hb), (0, nx * T - Wb)))
    tiles = Bp.reshape(ny, T, nx, T).transpose(0, 2, 1, 3).reshape(
        ny * nx, T, T)
    tiles = jax.vmap(_normalise)(tiles)
    logits = model.apply(params, tiles[..., None])
    prob = jax.nn.sigmoid(logits)
    probf = prob.reshape(ny, nx, T, T).transpose(0, 2, 1, 3).reshape(
        ny * T, nx * T)[:Hb, :Wb]
    binmask = probf > cfg.threshold
    if cfg.min_area > 1:
        # ASTA's area_threshold (reference blackbox.py:4131-4137 drops
        # sub-area_threshold components before the kron unbin): label
        # the binned mask and zero components below min_area.  The
        # min-propagation labeling under-merges blobs longer than
        # ``iters`` px — a real trail then splits into fragments each
        # >= ~iters px long, all far above min_area, so the filter's
        # keep/drop decisions match exact labeling for everything but
        # pathological sub-min_area fragments of real trails.
        from blackbox_tpu.ops.labeling import label_components
        lab = label_components(binmask, iters=64)
        areas = jnp.zeros(binmask.size + 2, jnp.int32).at[
            lab.ravel()].add(binmask.ravel().astype(jnp.int32))
        binmask = binmask & (areas[lab] >= cfg.min_area)
    # unbin with kron-style expansion (reference np.kron, blackbox.py:4146)
    f = cfg.bin_factor
    big = jnp.repeat(jnp.repeat(binmask, f, axis=0), f, axis=1)
    H, W = image.shape
    big = big[:H, :W]
    big = jnp.pad(big, ((0, H - big.shape[0]), (0, W - big.shape[1])))
    return big, jnp.sum(binmask)


def init_params(rng_key, tile: int = 256):
    model = TrailUNet()
    return model.init(rng_key, jnp.zeros((1, tile, tile, 1)))


# --------------------------------------------------------- training

def synth_batch(rng: np.random.Generator, n: int, size: int = 256,
                p_trail: float = 0.7):
    """Synthetic binned tiles + trail masks for self-training."""
    from blackbox_tpu.synth.generator import star_image

    xs = np.zeros((n, size, size), np.float32)
    ys = np.zeros((n, size, size), np.float32)
    for i in range(n):
        img = rng.normal(0.0, 1.0, (size, size)).astype(np.float32)
        nst = rng.integers(3, 25)
        st = np.stack([rng.uniform(5, size - 5, nst),
                       rng.uniform(5, size - 5, nst),
                       np.exp(rng.uniform(np.log(30), np.log(3000), nst)),
                       rng.uniform(0.8, 1.5, nst)], 1)
        img += star_image((size, size), st).astype(np.float32)
        if rng.random() < p_trail:
            x0, y0 = rng.uniform(0, size, 2)
            ang = rng.uniform(0, np.pi)
            amp = rng.uniform(2.0, 15.0)
            width = rng.uniform(0.6, 2.0)
            yy, xx = np.mgrid[0:size, 0:size]
            d = np.abs(np.cos(ang) * (yy - y0) - np.sin(ang) * (xx - x0))
            img += amp * np.exp(-0.5 * (d / width) ** 2)
            ys[i] = (d < 2.0 * width).astype(np.float32)
        xs[i] = img
    return xs, ys


def train(steps: int = 300, batch: int = 8, lr: float = 3e-4,
          seed: int = 0, size: int = 128, log_every: int = 50):
    """Self-contained training on synthetic trails; returns params."""
    import optax

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    model = TrailUNet()
    params = model.init(key, jnp.zeros((1, size, size, 1)))
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, x, y):
        def loss_fn(p):
            logits = model.apply(p, _normalise_np(x)[..., None])
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state2 = opt.update(grads, state)
        return optax.apply_updates(params, updates), state2, loss

    def _normalise_np(x):
        med = jnp.median(x, axis=(1, 2), keepdims=True)
        mad = jnp.median(jnp.abs(x - med), axis=(1, 2),
                         keepdims=True) * 1.4826 + 1e-6
        return jnp.clip((x - med) / mad, -5.0, 25.0) / 25.0

    for i in range(steps):
        x, y = synth_batch(rng, batch, size)
        params, state, loss = step(params, state, jnp.asarray(x),
                                   jnp.asarray(y))
        if log_every and i % log_every == 0:
            print(f"trailnet step {i}: loss {float(loss):.4f}")
    return params


def convert_keras_weights(h5_path: str, tile: int = 256):
    """Port a keras U-Net weight file (the production ASTA model,
    reference set_blackbox.py:222-228) onto the flax TrailUNet.

    Keras HDF5 layout: ``model_weights/<layer>/.../{kernel,bias}:0``.
    Conv2D kernels are (kh, kw, in, out) — flax ``nn.Conv`` identical;
    Conv2DTranspose kernels are (kh, kw, OUT, IN) and get their channel
    axes swapped for flax ``nn.ConvTranspose``.  Weights are assigned to
    our layers in topological order with strict shape checking, so a
    topology mismatch fails loudly instead of silently mis-porting.
    """
    import h5py
    from flax import traverse_util

    template = init_params(jax.random.PRNGKey(0), tile)
    flat = traverse_util.flatten_dict(template["params"])
    # our layers in definition (topological) order
    ours = sorted(
        flat.keys(),
        key=lambda kp: _layer_order(kp))

    # harvest (name, kernel, bias) from the h5 in stored layer order
    kio = []
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = list(root.attrs.get("layer_names", [])) or list(root)
        for name in names:
            name = name.decode() if isinstance(name, bytes) else name
            if name not in root:
                continue
            grp = root[name]
            ds = {}
            grp.visititems(
                lambda p, obj: ds.__setitem__(p.rsplit("/", 1)[-1], obj)
                if hasattr(obj, "shape") else None)
            if "kernel:0" in ds:
                b = ds.get("bias:0")
                # np.array(None) is a 0-d object array that defeats the
                # `bias is not None` skip below — keep missing biases
                # (use_bias=False Conv2D layers, standard before
                # BatchNorm) as real None
                kio.append((name, np.array(ds["kernel:0"]),
                            np.array(b) if b is not None else None))

    kernels = [kp for kp in ours if kp[-1] == "kernel"]
    if len(kio) != len(kernels):
        raise ValueError(
            f"keras model has {len(kio)} weighted layers; TrailUNet "
            f"has {len(kernels)} — topology mismatch")
    out = dict(flat)
    for kp, (name, kern, bias) in zip(kernels, kio):
        want = flat[kp].shape
        if kern.shape != want:
            swapped = np.swapaxes(kern, -1, -2)
            if "transpose" in name.lower() and swapped.shape == want:
                kern = swapped        # keras Conv2DTranspose (.., out, in)
            else:
                raise ValueError(
                    f"layer {name}: kernel {kern.shape} != {want}")
        out[kp] = jnp.asarray(kern, jnp.float32)
        bkey = kp[:-1] + ("bias",)
        if bias is not None and bkey in flat:
            if bias.shape != flat[bkey].shape:
                raise ValueError(
                    f"layer {name}: bias {bias.shape} != "
                    f"{flat[bkey].shape}")
            out[bkey] = jnp.asarray(bias, jnp.float32)
    return {"params": traverse_util.unflatten_dict(out)}


def _layer_order(key_path) -> tuple:
    """Topological sort key for TrailUNet parameter paths."""
    def num(s, pre):
        try:
            return int(s.replace(pre, "") or 0)
        except ValueError:
            return 0

    parts = [str(p) for p in key_path]
    # encoder ConvBlock_0..1, bottleneck ConvBlock_2, decoder pairs
    # (ConvTranspose_i interleaved with ConvBlock_3..), final Conv_0
    rank = []
    for p in parts:
        if p.startswith("ConvBlock_"):
            i = num(p, "ConvBlock_")
            rank.append(2 * i if i <= 2 else 5 + 2 * (i - 3) + 1)
        elif p.startswith("ConvTranspose_"):
            rank.append(5 + 2 * num(p, "ConvTranspose_"))
        elif p.startswith("Conv_") and "Block" not in p:
            rank.append(100 + num(p, "Conv_"))
    return (tuple(rank), parts[-2] if len(parts) > 1 else "",
            parts[-1])


def save_params(path: str, params):
    from flax import serialization
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(params))


def load_params(path: str, tile: int = 256):
    from flax import serialization
    template = init_params(jax.random.PRNGKey(0), tile)
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())
