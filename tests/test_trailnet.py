import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blackbox_tpu.models.trailnet import (
    TrailNetConfig, TrailUNet, init_params, segment_trails, synth_batch,
    train, save_params, load_params)


def test_unet_shapes():
    params = init_params(jax.random.PRNGKey(0), tile=64)
    x = jnp.zeros((2, 64, 64, 1))
    out = TrailUNet().apply(params, x)
    assert out.shape == (2, 64, 64)


def test_synth_batch_labels(rng):
    x, y = synth_batch(rng, 6, size=64, p_trail=1.0)
    assert x.shape == (6, 64, 64) and y.shape == (6, 64, 64)
    assert all(y[i].sum() > 20 for i in range(6))


@pytest.mark.slow
def test_train_and_segment(tmp_path, rng):
    # short training run must learn to find an obvious trail; a few
    # hundred steps reach ~0.5 core probability (full training sharpens
    # it further), so test with a matched threshold on the trail core
    params = train(steps=250, batch=8, size=64, seed=1, log_every=0)

    size = 256
    img = rng.normal(100.0, 3.0, (size, size)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    d = np.abs(0.6 * (yy - 30) - 0.8 * (xx - 10))
    img += 40.0 * np.exp(-0.5 * (d / 1.5) ** 2)

    cfg = TrailNetConfig(bin_factor=2, tile=64, min_area=10,
                         threshold=0.3)
    mask, npix = segment_trails(params, jnp.asarray(img), cfg)
    mask = np.asarray(mask)
    assert mask.shape == img.shape
    on_core = mask[np.asarray(d < 2.0)].mean()
    off_trail = mask[np.asarray(d > 20.0)].mean()
    assert on_core > 0.4, on_core
    assert off_trail < 0.05, off_trail
    assert on_core > 10 * max(off_trail, 1e-3)

    # params round-trip through the serialisation layer
    p = str(tmp_path / "trailnet.msgpack")
    save_params(p, params)
    params2 = load_params(p, tile=64)
    m2, _ = segment_trails(params2, jnp.asarray(img), cfg)
    np.testing.assert_array_equal(np.asarray(m2), mask)


def test_keras_weight_conversion_roundtrip(tmp_path):
    """Export TrailUNet params in the keras HDF5 layout and convert
    back: the ported params must reproduce the network bit for bit
    (validates layer ordering, shape checks, and the Conv2DTranspose
    channel swap)."""
    import h5py
    import jax
    import numpy as np
    import jax.numpy as jnp
    from flax import traverse_util
    from blackbox_tpu.models.trailnet import (TrailUNet,
                                              convert_keras_weights,
                                              init_params, _layer_order)

    params = init_params(jax.random.PRNGKey(3), tile=64)
    flat = traverse_util.flatten_dict(params["params"])
    kernels = sorted([kp for kp in flat if kp[-1] == "kernel"],
                     key=_layer_order)

    h5p = str(tmp_path / "asta.h5")
    with h5py.File(h5p, "w") as f:
        root = f.create_group("model_weights")
        names = []
        for i, kp in enumerate(kernels):
            is_tr = any(p.startswith("ConvTranspose") for p in kp)
            name = f"conv2d_transpose_{i}" if is_tr else f"conv2d_{i}"
            names.append(name.encode())
            g = root.create_group(name).create_group(name)
            kern = np.asarray(flat[kp])
            if is_tr:
                # keras stores transpose kernels as (kh, kw, out, in)
                kern = np.swapaxes(kern, -1, -2)
            g.create_dataset("kernel:0", data=kern)
            g.create_dataset("bias:0",
                             data=np.asarray(flat[kp[:-1] + ("bias",)]))
        root.attrs["layer_names"] = names

    ported = convert_keras_weights(h5p, tile=64)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (1, 64, 64, 1)).astype(np.float32))
    model = TrailUNet()
    np.testing.assert_array_equal(
        np.asarray(model.apply(params, x)),
        np.asarray(model.apply(ported, x)))
