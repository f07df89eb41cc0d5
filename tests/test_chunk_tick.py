"""Whole-tick streaming megakernel (ops/pallas/chunk_tick.py): one
pallas_call over (layer, slot-block) must reproduce the per-layer fused
chunk path exactly — outputs, rolled KV caches, conv ring caches —
including per-slot offsets/validity and non-divisible slot counts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.ops.pallas.chunk_layer import fused_chunk_layer
from masr_tpu.ops.pallas.chunk_tick import (fused_chunk_tick,
                                            stack_tick_params)

NL, B, c, D, F, H, C, KS = 3, 8, 16, 64, 96, 2, 64, 7
d_k = D // H
L = C + c


def _params(rs):
    f32, bf = jnp.float32, jnp.float32   # keep f32 for exact CPU parity
    out = []
    for _ in range(NL):
        p = {
            "lnw": jnp.asarray(
                rs.standard_normal((6, 2, D)) * 0.1
                + (np.arange(2)[None, :, None] == 0), f32),
            "ffw1": jnp.asarray(rs.standard_normal((2, D, F)) * 0.1, bf),
            "ffb1": jnp.asarray(rs.standard_normal((2, F)) * 0.05, f32),
            "ffw2": jnp.asarray(rs.standard_normal((2, F, D)) * 0.1, bf),
            "vecb": jnp.asarray(rs.standard_normal((8, D)) * 0.05, f32),
            "attw": jnp.asarray(rs.standard_normal((4, D, D)) * 0.1, bf),
            "posb": jnp.asarray(rs.standard_normal((2, D)) * 0.05, f32),
            "pw1w": jnp.asarray(rs.standard_normal((D, 2 * D)) * 0.1, bf),
            "pw1b": jnp.asarray(rs.standard_normal((1, 2 * D)) * 0.05, f32),
            "pw2w": jnp.asarray(rs.standard_normal((D, D)) * 0.1, bf),
            "dww": jnp.asarray(rs.standard_normal((KS, D)) * 0.1, f32),
        }
        wpos = jnp.asarray(rs.standard_normal((D, D)) * 0.1, bf)
        out.append((p, wpos))
    return out


@pytest.mark.parametrize("nslots", [8, 6])
def test_tick_matches_per_layer_path(nslots):
    rs = np.random.RandomState(0)
    packed = _params(rs)
    x = jnp.asarray(rs.standard_normal((nslots, c, D)) * 0.3, jnp.float32)
    pe = jnp.asarray(rs.standard_normal((nslots, L, D)) * 0.3, jnp.float32)
    ac = jnp.asarray(rs.standard_normal((NL, nslots, H, C, 2 * d_k)) * 0.2,
                     jnp.float32)
    cc = jnp.asarray(rs.standard_normal((NL, nslots, KS - 1, D)) * 0.2,
                     jnp.float32)
    clens = jnp.asarray(([0, 16, C, 33, C, 5, 64, 48])[:nslots], jnp.int32)

    # reference: 12 sequential per-layer fused calls
    xs = x
    ref_ac, ref_cc = [], []
    posp_all = []
    for i, (p, wpos) in enumerate(packed):
        posp = jnp.einsum("nld,de->nle", pe, wpos,
                          preferred_element_type=jnp.float32)
        posp_all.append(posp)
        xs, a, cn = fused_chunk_layer(
            xs, posp, ac[i], cc[i], clens, p,
            n_head=H, ksize=KS, interpret=True)
        ref_ac.append(a)
        ref_cc.append(cn)
    ref_y = xs

    stacked, _ = stack_tick_params(packed)
    y, nac, ncc = fused_chunk_tick(
        x, jnp.stack(posp_all), ac, cc, clens, stacked,
        n_head=H, ksize=KS, interpret=True, block_b=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nac), np.asarray(jnp.stack(ref_ac)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ncc), np.asarray(jnp.stack(ref_cc)),
                               rtol=1e-5, atol=1e-5)
