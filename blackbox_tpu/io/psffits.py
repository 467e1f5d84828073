"""PSF model (de)serialisation in the PSFEx `_psf.fits` spirit.

The reference reads PSFEx models back from disk for co-add clipping and
PSF-star work (/root/reference/buildref.py:3328-3366, zogy get_psf_ima);
our :class:`PSFModel` ships the same information — polynomial basis
images + poldeg/polzero/polscal sampling — as one image extension plus
keywords, so any consumer can reconstruct the spatially-varying PSF.
"""

from __future__ import annotations

import numpy as np

from blackbox_tpu.io.fits import Header, read_fits, write_image
from blackbox_tpu.ops.psf import PSFModel


def psf_to_hdu(model: PSFModel):
    h = Header()
    h["POLDEG"] = (int(model.poldeg), "spatial polynomial degree")
    h["POLZERO1"] = (float(np.asarray(model.polzero_x)), "x zero point")
    h["POLZERO2"] = (float(np.asarray(model.polzero_y)), "y zero point")
    h["POLSCAL1"] = (float(np.asarray(model.polscal_x)), "x scale")
    h["POLSCAL2"] = (float(np.asarray(model.polscal_y)), "y scale")
    h["PSFSTARS"] = (int(np.asarray(model.nstars)), "stars used in fit")
    h["PSFCHI2"] = (round(float(np.asarray(model.chi2)), 4),
                    "median reduced chi2")
    h["EXTNAME"] = ("PSF_DATA", "")
    return np.asarray(model.basis, np.float32), h


def write_psf(path: str, model: PSFModel, header: Header | None = None):
    basis, h = psf_to_hdu(model)
    write_image(path, None, header or Header(),
                extensions=[("image", basis, h)])


def read_psf(path: str) -> PSFModel:
    for data, h in read_fits(path):
        if h.get("EXTNAME", "").strip() == "PSF_DATA":
            import jax.numpy as jnp
            return PSFModel(
                basis=jnp.asarray(np.asarray(data, np.float32)),
                polzero_x=jnp.float32(h["POLZERO1"]),
                polzero_y=jnp.float32(h["POLZERO2"]),
                polscal_x=jnp.float32(h["POLSCAL1"]),
                polscal_y=jnp.float32(h["POLSCAL2"]),
                poldeg=int(h["POLDEG"]),
                nstars=jnp.int32(h["PSFSTARS"]),
                chi2=jnp.float32(h["PSFCHI2"]))
    raise ValueError(f"{path}: no PSF_DATA extension")
