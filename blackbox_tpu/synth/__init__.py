from blackbox_tpu.synth.generator import (  # noqa: F401
    SynthTruth, make_raw_science, make_raw_bias, make_raw_flat, star_image,
)
