from lyssandra_tpu.dict_learning.ksvd import (
    ksvd_atom_update,
    ksvd_atom_update_compact,
    ksvd_step,
    ksvd_step_compact,
    KSVDLearner,
)
from lyssandra_tpu.dict_learning.online import (
    online_dl_step,
    OnlineDictionaryLearner,
)
