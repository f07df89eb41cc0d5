"""GlobalCMVN (parity: masr/model_utils/utils/cmvn.py:4-32).

Mean/istd are baked into the model as constants so exported inference
bundles are self-contained — they fold into the first matmul under XLA.
"""
import numpy as np
import jax.numpy as jnp


class GlobalCMVN:
    """(x - mean) * istd, optionally disabled (norm_var=False keeps mean only)."""

    def __init__(self, mean, istd, norm_var=True):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.istd = np.asarray(istd, dtype=np.float32)
        self.norm_var = norm_var

    def __call__(self, x):
        x = x - jnp.asarray(self.mean)
        if self.norm_var:
            x = x * jnp.asarray(self.istd)
        return x
