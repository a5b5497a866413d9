from lyssandra_tpu.apps.denoise import Denoiser, denoise, denoise_adaptive
from lyssandra_tpu.apps.features import FeatureExtractor, spatial_pyramid_pool
from lyssandra_tpu.apps.inpaint import inpaint
