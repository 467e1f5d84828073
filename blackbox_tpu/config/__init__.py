from blackbox_tpu.config.base import get_par, Settings  # noqa: F401
from blackbox_tpu.config.defaults import (  # noqa: F401
    ReductionSettings, BuildRefSettings, default_settings,
)
