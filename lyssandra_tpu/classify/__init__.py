from lyssandra_tpu.classify.lc_ksvd import LCKSVD
from lyssandra_tpu.classify.src import SRCClassifier
from lyssandra_tpu.classify.linear import LinearClassifier, LinearSVM, ridge, one_hot
