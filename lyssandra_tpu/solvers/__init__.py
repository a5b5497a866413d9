from lyssandra_tpu.solvers.greedy import (
    omp,
    batch_omp,
    group_omp,
    masked_omp,
    nn_omp,
    threshold_code,
    GreedyResult,
)
from lyssandra_tpu.solvers.lasso import (
    feature_sign, fista, lars, lars_path, LarsPath, lasso, lasso_lars,
)
from lyssandra_tpu.solvers.llc import llc
from lyssandra_tpu.solvers.encoder import SparseEncoder, sparse_encoder
