from lyssandra_tpu.utils.workspace import Workspace
from lyssandra_tpu.utils.datasets import (
    load_image,
    load_image_folders,
    synthetic_image,
    synthetic_color_image,
    standard_test_image,
    patch_dataset,
)
from lyssandra_tpu.utils.profiling import profile_trace, timed
from lyssandra_tpu.utils.compile_cache import (
    cache_enabled,
    enable_compile_cache,
)
