"""Weight initializers.

Reproduces the reference's initializer family (/root/reference/agents/
utils.py:11-41): orthogonal init via SVD of a standard normal, scaled by
sqrt(2), the default for every fc/lstm layer.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SCALE = float(np.sqrt(2))


def ortho_init(rng: np.random.Generator, shape, scale: float = DEFAULT_SCALE):
    """Orthogonal initializer (lasagne-style, ref agents/utils.py:11-24)."""
    shape = tuple(shape)
    if len(shape) == 2:
        flat_shape = shape
    else:
        flat_shape = (int(np.prod(shape[:-1])), shape[-1])
    a = rng.standard_normal(flat_shape)
    u, _, v = np.linalg.svd(a, full_matrices=False)
    q = u if u.shape == flat_shape else v
    q = q.reshape(shape)
    return (scale * q).astype(np.float32)
