"""blackbox_tpu — a TPU-native astronomical image-reduction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the BlackBOX
pipeline (MeerLICHT / BlackGEM nightly reduction; reference:
pmvreeswijk/BlackBOX).  Where the reference reduces one frame per CPU
process with numpy + C binaries (astroscrappy, SExtractor, PSFEx, SWarp,
Astrometry.net, fpack), this framework runs the whole per-frame chain as
jit-compiled device programs over channel stacks, batched and sharded over
TPU meshes, with host-side FITS I/O, declarative QC, and an idempotent
manifest orchestration layer.

Layers (see SURVEY.md §7.1):
  core/    frame model + CCD channel geometry
  ops/     device kernel library (calibration, masking, cosmics, detection,
           photometry, warp, ZOGY subtraction, co-addition)
  pallas/  hand-written TPU kernels for the stencil-heavy hot ops
  pipeline/ jitted end-to-end pipelines (reduce, masters, subtract, buildref)
  qc/      declarative header-range quality control
  io/      FITS read/write, Rice codec, storage backends, manifests
  astro/   WCS, time, ephemerides, astrometric solving, photometric cal
  parallel/ device-mesh sharding of frame batches and frame tiles
  orchestration/ nightly ingest queue, scheduler, cluster adapters
  reporting/ obslog, thumbnails, finding charts
"""

__version__ = "0.1.0"

from blackbox_tpu.core.geometry import CCDGeometry  # noqa: F401
from blackbox_tpu.core.frame import Frame  # noqa: F401
