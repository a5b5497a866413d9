"""lyssandra_tpu — a TPU-native sparse-coding framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
ektormak/Lyssandra reference (see SURVEY.md): patch pipeline, greedy and
convex sparse solvers, K-SVD / LC-KSVD / online dictionary learning, SRC and
linear classification, and image-denoising / feature-extraction applications
— batched over thousands of patches per chip and sharded over a device mesh.

Public API map (reference-mirroring names -> modules):

    sparse_encoder / SparseEncoder     solvers.encoder
    omp, batch_omp, group_omp, nn_omp  solvers.greedy
    feature_sign / lasso, fista        solvers.lasso
    KSVDLearner (ksvd), OnlineDictionaryLearner   dict_learning
    LCKSVD, SRCClassifier, LinearClassifier       classify
    Denoiser / denoise, FeatureExtractor          apps
    extract_patches, remove_dc, contrast_normalize, Whitener,
    dct_dictionary, init_dictionary               ops
    make_mesh, shard_patches, ksvd_train_step     parallel
    Workspace, synthetic images, profiling        utils
"""

from lyssandra_tpu import config
from lyssandra_tpu.config import (
    OMPConfig,
    LassoConfig,
    KSVDConfig,
    OnlineDLConfig,
    LCKSVDConfig,
    DenoiseConfig,
    WhitenConfig,
    MeshConfig,
)
from lyssandra_tpu.oracle import psnr  # numpy metric helper
from lyssandra_tpu.ops import (
    contrast_normalize,
    dct_dictionary,
    extract_patches,
    init_dictionary,
    normalize_atoms,
    reconstruct_from_patches,
    remove_dc,
)
from lyssandra_tpu.ops.whitening import Whitener, ZCAWhitener
from lyssandra_tpu.solvers import (
    SparseEncoder,
    batch_omp,
    feature_sign,
    fista,
    group_omp,
    lars,
    lars_path,
    LarsPath,
    lasso,
    lasso_lars,
    llc,
    nn_omp,
    omp,
    sparse_encoder,
    threshold_code,
)
from lyssandra_tpu.dict_learning import (
    KSVDLearner,
    OnlineDictionaryLearner,
)
from lyssandra_tpu.dict_learning.ksvd import ksvd
from lyssandra_tpu.classify import LCKSVD, LinearClassifier, LinearSVM, SRCClassifier
from lyssandra_tpu.apps import Denoiser, FeatureExtractor, denoise
from lyssandra_tpu.utils.compile_cache import enable_compile_cache
from lyssandra_tpu.utils import Workspace

__version__ = "0.1.0"
