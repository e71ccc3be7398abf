from decompdiff_tpu.preprocess.decompose import (
    find_exact_cover, is_terminal_fragment, assign_fragments,
    DecomposeError)
