from lyssandra_tpu.ops.patches import (
    extract_patches,
    fold_patches,
    reconstruct_from_patches,
    weighted_reconstruct,
    remove_dc,
    contrast_normalize,
    n_patches,
)
from lyssandra_tpu.ops.dictionaries import (
    dct_dictionary,
    dct_dictionary_color,
    init_dictionary,
    normalize_atoms,
    mutual_coherence,
    replace_unused_atoms,
)
