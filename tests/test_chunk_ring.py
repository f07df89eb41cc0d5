"""Ring-buffer attention cache for the fused chunk step (VERDICT r3
item 2c): the kernel writes ONLY the c fresh K/V rows per tick instead
of rewriting all C rows. These tests pin exact equivalence of the ring
route against the roll-and-rewrite route over multi-tick sequences —
warmup (partial validity), steady state, ring WRAP-AROUND, inactive
slots (whose rings must stay untouched), and multi-chunk ticks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.ops.pallas.chunk_layer import fused_chunk_layer
from tests.chunk_common import _params, B, c, D, F, H, C, KS, d_k, L


def _seq_inputs(rs, T, nslots=B):
    return [jnp.asarray(rs.standard_normal((nslots, c, D)) * 0.3,
                        jnp.float32) for _ in range(T)]


def _posp(rs, nslots=B):
    return jnp.asarray(rs.standard_normal((nslots, L, D)) * 0.3,
                       jnp.float32)


def _run_pair(T, actives, n_sub=1):
    """Run T ticks through both routes; active slots advance, inactive
    slots' inputs are garbage that must not leak into their state."""
    rs = np.random.RandomState(0)
    p = _params(rs)
    nslots = B
    cc_z = jnp.zeros((nslots, KS - 1, D), jnp.float32)

    # roll-and-rewrite reference (with XLA-side where() merge, exactly
    # like the engine's non-ring path)
    ref_cache = jnp.zeros((nslots, H, C, 2 * d_k), jnp.float32)
    ref_cc = cc_z
    ref_clens = jnp.zeros((nslots,), jnp.int32)
    # ring route (mirrored layout: 2·C rows, halves duplicate)
    ring_cache = jnp.zeros((nslots, H, 2 * C, 2 * d_k), jnp.float32)
    ring_cc = cc_z
    ring_clens = jnp.zeros((nslots,), jnp.int32)
    wptr = jnp.zeros((nslots,), jnp.int32)

    rs2 = np.random.RandomState(1)
    ys_ref, ys_ring = [], []
    for t in range(T):
        x = jnp.asarray(rs2.standard_normal((nslots, c, D)) * 0.3,
                        jnp.float32)
        posp = _posp(rs2)
        act = jnp.asarray(actives[t], bool)
        y1, na1, nc1 = fused_chunk_layer(
            x, posp, ref_cache, ref_cc, ref_clens, p, n_head=H, ksize=KS,
            interpret=True, n_sub=n_sub)
        m = act.reshape(-1, 1, 1, 1)
        ref_cache = jnp.where(m, na1, ref_cache)
        ref_cc = jnp.where(act.reshape(-1, 1, 1), nc1, ref_cc)
        ref_clens = jnp.where(act, jnp.minimum(ref_clens + c, C), ref_clens)

        y2, na2, nc2 = fused_chunk_layer(
            x, posp, ring_cache, ring_cc, ring_clens, p,
            wptrs=wptr, active=act, n_head=H, ksize=KS,
            interpret=True, n_sub=n_sub)
        ring_cache = na2                      # aliased: kernel-managed
        ring_cc = jnp.where(act.reshape(-1, 1, 1), nc2, ring_cc)
        ring_clens = jnp.where(act, jnp.minimum(ring_clens + c, C),
                               ring_clens)
        wptr = jnp.where(act, (wptr + c) % C, wptr)
        ys_ref.append(np.asarray(y1))
        ys_ring.append(np.asarray(y2))
    return ys_ref, ys_ring, actives


def _check(ys_ref, ys_ring, actives):
    for t, (a, b) in enumerate(zip(ys_ref, ys_ring)):
        act = actives[t]
        np.testing.assert_allclose(b[act], a[act], rtol=1e-5, atol=1e-5,
                                   err_msg=f"tick {t}")


def test_ring_matches_roll_all_active_through_wraparound():
    # C/c = 4 ticks fill the ring; 11 ticks wrap it 2.75×
    T = 11
    actives = [np.ones((B,), bool)] * T
    _check(*_run_pair(T, actives))


def test_ring_inactive_slots_untouched():
    rs = np.random.RandomState(7)
    T = 8
    actives = [rs.rand(B) > 0.4 for _ in range(T)]
    for a in actives:
        a[0] = True                  # slot 0 always ticks (anchor)
    _check(*_run_pair(T, actives))


@pytest.mark.parametrize("n_sub", [2])
def test_ring_multi_chunk_tick(n_sub):
    T = 9
    actives = [np.ones((B,), bool)] * T
    _check(*_run_pair(T, actives, n_sub=n_sub))


def test_ring_mirror_invariant_after_wraparound():
    """The mirrored layout's contract: rows [C, 2·C) always duplicate
    rows [0, C) (the kernel writes every fresh block to both copies), so
    the chronological read window [wp, wp + C) is exact for every wp."""
    rs = np.random.RandomState(3)
    p = _params(rs)
    nslots = B
    cache = jnp.zeros((nslots, H, 2 * C, 2 * d_k), jnp.float32)
    cc = jnp.zeros((nslots, KS - 1, D), jnp.float32)
    clens = jnp.zeros((nslots,), jnp.int32)
    wptr = jnp.zeros((nslots,), jnp.int32)
    act = jnp.ones((nslots,), bool)
    for t in range(C // c + 3):              # fill + wrap
        x = jnp.asarray(rs.standard_normal((nslots, c, D)) * 0.3,
                        jnp.float32)
        posp = _posp(rs)
        _, cache, cc = fused_chunk_layer(
            x, posp, cache, cc, clens, p, wptrs=wptr, active=act,
            n_head=H, ksize=KS, interpret=True)
        clens = jnp.minimum(clens + c, C)
        wptr = (wptr + c) % C
        np.testing.assert_array_equal(np.asarray(cache[:, :, C:]),
                                      np.asarray(cache[:, :, :C]),
                                      err_msg=f"tick {t}")
    assert np.abs(np.asarray(cache)).max() > 0   # writes actually landed


def test_ring_block_shrinks_to_divisor():
    """B=3 slots: the ring path must shrink the slot block to a divisor
    of B instead of padding (padding would copy the aliased buffer)."""
    rs = np.random.RandomState(0)
    p = _params(rs)
    n = 3
    x = jnp.asarray(rs.standard_normal((n, c, D)) * 0.3, jnp.float32)
    posp = jnp.asarray(rs.standard_normal((n, L, D)) * 0.3, jnp.float32)
    cache = jnp.zeros((n, H, C, 2 * d_k), jnp.float32)
    ring_cache = jnp.zeros((n, H, 2 * C, 2 * d_k), jnp.float32)
    cc = jnp.zeros((n, KS - 1, D), jnp.float32)
    clens = jnp.zeros((n,), jnp.int32)
    y, na, nc = fused_chunk_layer(
        x, posp, ring_cache, cc, clens, p,
        wptrs=jnp.zeros((n,), jnp.int32),
        active=jnp.ones((n,), bool), n_head=H, ksize=KS, interpret=True)
    y0, na0, nc0 = fused_chunk_layer(x, posp, cache, cc, clens, p,
                                     n_head=H, ksize=KS, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=1e-5,
                               atol=1e-5)
