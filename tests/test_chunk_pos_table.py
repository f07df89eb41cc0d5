"""In-kernel positions DMA for the fused chunk step: the per-layer HBM
position table (make_chunk_pos_table) must reproduce the per-slot posp
einsum route exactly — row o+j of the table IS position max(o-C+j, 0) —
including clamped long-session offsets, through both the raw kernels and
forward_chunk_batched."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from masr_tpu.ops.pallas.chunk_layer import (
    clamp_pos_starts, fused_chunk_layer, make_chunk_pos_table)
from tests.chunk_common import _params, B, c, D, F, H, C, KS, d_k, L

TAB = 512


def _inputs(nslots, rs):
    x = jnp.asarray(rs.standard_normal((nslots, c, D)) * 0.3, jnp.float32)
    cache = jnp.asarray(rs.standard_normal((nslots, H, C, 2 * d_k)) * 0.5,
                        jnp.float32)
    cc = jnp.asarray(rs.standard_normal((nslots, KS - 1, D)) * 0.2,
                     jnp.float32)
    clens = jnp.asarray([0, 16, C, 33][:nslots], jnp.int32)
    return x, cache, cc, clens


def test_pos_table_rows_match_einsum_route():
    """Table rows == the einsum-projected per-slot position windows."""
    from masr_tpu.models.embedding import sinusoid_position_encoding
    rs = np.random.RandomState(1)
    wpos = jnp.asarray(rs.standard_normal((D, D)) * 0.1, jnp.float32)
    tab = make_chunk_pos_table(wpos, C, TAB, jnp.float32)
    # lane dim is padded to the 128 tiling for the in-kernel DMA; the
    # pad columns must be zero and the logical columns exact
    assert tab.shape == (TAB, -(-D // 128) * 128)
    assert not np.any(np.asarray(tab[:, D:]))
    for off in (0, 5, C, 200):
        positions = jnp.maximum(off - C + jnp.arange(L), 0)
        pe = sinusoid_position_encoding(positions, D, jnp.float32)
        posp = jnp.einsum("ld,de->le", pe, wpos,
                          preferred_element_type=jnp.float32)
        window = tab[off:off + L, :D]
        np.testing.assert_allclose(np.asarray(window), np.asarray(posp),
                                   rtol=1e-6, atol=1e-6)


def test_table_kernel_matches_posp_kernel():
    rs = np.random.RandomState(0)
    p = _params(rs)
    x, cache, cc, clens = _inputs(B, rs)
    wpos = jnp.asarray(rs.standard_normal((D, D)) * 0.1, jnp.float32)
    tab = make_chunk_pos_table(wpos, C, TAB, jnp.float32)
    offsets = jnp.asarray([0, 16, 200, 64], jnp.int32)
    starts = clamp_pos_starts(offsets, TAB, L)
    # the exact same rows (minus the DMA lane pad), fed through the
    # posp input path
    posp = jnp.stack([tab[int(o):int(o) + L, :D] for o in starts])

    ref = fused_chunk_layer(x, posp, cache, cc, clens, p,
                            n_head=H, ksize=KS, interpret=True)
    got = fused_chunk_layer(x, None, cache, cc, clens, p, None, tab,
                            starts, n_head=H, ksize=KS, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a).astype(np.float32),
                                   np.asarray(b).astype(np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_forward_chunk_batched_table_route_matches_einsum_route():
    """pack_chunk_params(cache_size=...) flips forward_chunk_batched to
    the table route; outputs must match the per-tick einsum route, and
    offsets past the table cap must clamp instead of crashing. Uses the
    engine's real 67-frame window (embeds to 16 frames): Mosaic can only
    lower the in-kernel table DMA for 8-aligned start rows, so the route
    is gated on an 8-divisible post-subsampling chunk size (the old
    71-frame/17-chunk shape in this test would REFUSE to compile on real
    TPU hardware — it now falls back to the einsum route, checked in
    test_table_pack_falls_back_on_unaligned_chunk)."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.models.conformer import ConformerEncoder

    KW = dict(input_size=80, output_size=D, attention_heads=H,
              linear_units=F, num_blocks=2, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="conv2d", pos_enc_layer_type="rel_pos",
              normalize_before=True, use_cnn_module=True,
              cnn_module_kernel=KS, causal=True,
              cnn_module_norm="layer_norm")
    enc = ConformerEncoder(**KW)
    rs = np.random.RandomState(5)
    N, chunk_in = 4, 16 * 4 + 3
    xs = jnp.asarray(rs.standard_normal((N, chunk_in, 80)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0),
                  "chunk": jax.random.PRNGKey(0)},
                 xs, jnp.full((N,), chunk_in, jnp.int32),
                 decoding_chunk_size=0, num_decoding_left_chunks=-1,
                 train=False)
    offsets = jnp.asarray([0, 16, 48, 64], jnp.int32)
    att = jnp.asarray(rs.standard_normal((2, N, H, C, 2 * d_k)) * 0.1,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((2, N, KS - 1, D)) * 0.1,
                      jnp.float32)
    clens = jnp.minimum(offsets, C)

    cl.FORCE_ON_CPU = True
    try:
        def run(table):
            def body(m):
                packed = m.pack_chunk_params(
                    cache_size=C if table else None, pos_table_len=TAB)
                if table:
                    assert len(packed[0]) == 3
                return m.forward_chunk_batched(xs, offsets, att, cnn,
                                               clens, packed=packed)
            return enc.apply(v, method=body)

        y0, a0, c0 = run(False)
        y1, a1, c1 = run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   rtol=2e-5, atol=2e-5)

        # past the cap: starts clamp to TAB - L (positions freeze); the
        # run must succeed and equal running AT the cap
        far = jnp.full((N,), TAB + 500, jnp.int32)

        def run_off(off):
            def body(m):
                packed = m.pack_chunk_params(cache_size=C,
                                             pos_table_len=TAB)
                return m.forward_chunk_batched(
                    xs, off, att, cnn, jnp.full((N,), C, jnp.int32),
                    packed=packed)
            return enc.apply(v, method=body)

        yf, _, _ = run_off(far)
        yc, _, _ = run_off(jnp.full((N,), TAB - L, jnp.int32))
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yc),
                                   rtol=1e-6, atol=1e-6)
    finally:
        cl.FORCE_ON_CPU = False


def test_table_pack_falls_back_on_unaligned_chunk():
    """A 71-frame window embeds to 17 frames — not 8-divisible, so the
    in-kernel table DMA cannot be lowered (Mosaic requires provably
    8-aligned start rows). forward_chunk_batched must then take the posp
    einsum route using the wpos kept alongside the table, producing the
    same outputs as a plain (table-free) pack."""
    import masr_tpu.ops.pallas.conformer_layer as cl
    from masr_tpu.models.conformer import ConformerEncoder

    KW = dict(input_size=80, output_size=D, attention_heads=H,
              linear_units=F, num_blocks=2, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="conv2d", pos_enc_layer_type="rel_pos",
              normalize_before=True, use_cnn_module=True,
              cnn_module_kernel=KS, causal=True,
              cnn_module_norm="layer_norm")
    enc = ConformerEncoder(**KW)
    rs = np.random.RandomState(7)
    N, chunk_in = 2, 16 * 4 + 7
    xs = jnp.asarray(rs.standard_normal((N, chunk_in, 80)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0),
                  "chunk": jax.random.PRNGKey(0)},
                 xs, jnp.full((N,), chunk_in, jnp.int32),
                 decoding_chunk_size=0, num_decoding_left_chunks=-1,
                 train=False)
    offsets = jnp.asarray([0, 17], jnp.int32)
    att = jnp.asarray(rs.standard_normal((2, N, H, C, 2 * d_k)) * 0.1,
                      jnp.float32)
    cnn = jnp.asarray(rs.standard_normal((2, N, KS - 1, D)) * 0.1,
                      jnp.float32)
    clens = jnp.minimum(offsets, C)

    cl.FORCE_ON_CPU = True
    try:
        def run(table):
            def body(m):
                packed = m.pack_chunk_params(
                    cache_size=C if table else None, pos_table_len=TAB)
                if table:
                    assert len(packed[0]) == 3
                return m.forward_chunk_batched(xs, offsets, att, cnn,
                                               clens, packed=packed)
            return enc.apply(v, method=body)

        y0, a0, c0 = run(False)
        y1, a1, c1 = run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   rtol=1e-6, atol=1e-6)
    finally:
        cl.FORCE_ON_CPU = False
