"""Shared tiny-model constants + raw packed-parameter builder for the
fused chunk-kernel tests (test_chunk_ring / test_chunk_multi /
test_chunk_pos_table / test_pos_reanchor). Lived in test_chunk_q8.py
until the int8 KV route was deleted in round 5 (engine-routable code
must carry a current measurement — docs/streaming_roofline.md round-5
decision record)."""
import numpy as np
import jax.numpy as jnp

B, c, D, F, H, C, KS = 4, 16, 64, 96, 2, 64, 7
d_k = D // H
L = C + c


def _params(rs):
    f32 = jnp.float32
    return {
        "lnw": jnp.asarray(
            rs.standard_normal((6, 2, D)) * 0.1
            + (np.arange(2)[None, :, None] == 0), f32),
        "ffw1": jnp.asarray(rs.standard_normal((2, D, F)) * 0.1, f32),
        "ffb1": jnp.asarray(rs.standard_normal((2, F)) * 0.05, f32),
        "ffw2": jnp.asarray(rs.standard_normal((2, F, D)) * 0.1, f32),
        "vecb": jnp.asarray(rs.standard_normal((8, D)) * 0.05, f32),
        "attw": jnp.asarray(rs.standard_normal((4, D, D)) * 0.1, f32),
        "posb": jnp.asarray(rs.standard_normal((2, D)) * 0.05, f32),
        "pw1w": jnp.asarray(rs.standard_normal((D, 2 * D)) * 0.1, f32),
        "pw1b": jnp.asarray(rs.standard_normal((1, 2 * D)) * 0.05, f32),
        "pw2w": jnp.asarray(rs.standard_normal((D, D)) * 0.1, f32),
        "dww": jnp.asarray(rs.standard_normal((KS, D)) * 0.1, f32),
    }
