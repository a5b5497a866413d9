from lyssandra_tpu.solvers.greedy import (
    omp,
    batch_omp,
    group_omp,
    threshold_code,
    GreedyResult,
)
