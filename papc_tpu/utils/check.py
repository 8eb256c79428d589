"""Shape utilities (reference ``libs/tools/check.py``)."""

import numpy as np


def shape_mergeable(shape, reference_shape):
    """True when ``shape`` can broadcast-merge into ``reference_shape``
    (-1 entries in either act as wildcards) — reference ``check.py:6``."""
    shape = list(np.shape(shape)) if not isinstance(shape, (list, tuple)) else list(shape)
    reference_shape = list(reference_shape)
    if len(shape) != len(reference_shape):
        return False
    for s, r in zip(shape, reference_shape):
        if s != -1 and r != -1 and s != r:
            return False
    return True
