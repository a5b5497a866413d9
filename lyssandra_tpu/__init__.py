"""lyssandra_tpu — a TPU-native sparse-coding framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
ektormak/Lyssandra reference (see SURVEY.md): patch pipeline, greedy and
convex sparse solvers, K-SVD / LC-KSVD / online dictionary learning, SRC and
linear classification, and image-denoising / feature-extraction applications
— batched over thousands of patches per chip and sharded over a device mesh.
"""

from lyssandra_tpu import config
from lyssandra_tpu.oracle import psnr  # numpy metric helper

__version__ = "0.1.0"
