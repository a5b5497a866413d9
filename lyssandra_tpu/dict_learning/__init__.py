from lyssandra_tpu.dict_learning.ksvd import (
    ksvd_atom_update,
    ksvd_step,
    KSVDLearner,
)
from lyssandra_tpu.dict_learning.online import (
    online_dl_step,
    OnlineDictionaryLearner,
)
