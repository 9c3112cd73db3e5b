"""Pallas kernel tests (interpret mode on CPU; bit-exactness vs oracles).
On real TPU these were additionally validated in compiled mode."""

import numpy as np

import jax.numpy as jnp

from eventful_transformer_tpu.ops.pallas.scatter import gather_rows, scatter_rows_inplace


def test_scatter_rows_inplace_masked(rng):
    B, N, C, K = 2, 16, 256, 5
    buf = rng.standard_normal((B, N, C)).astype(np.float32)
    vals = rng.standard_normal((B, K, C)).astype(np.float32)
    idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(np.int32)
    mask = rng.integers(0, 2, (B, K)).astype(bool)
    want = buf.copy()
    for b in range(B):
        for i in range(K):
            if mask[b, i]:
                want[b, idx[b, i]] = vals[b, i]
    got = scatter_rows_inplace(
        jnp.asarray(buf), jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_rows(rng):
    B, N, C, K = 2, 16, 256, 7
    buf = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = np.stack([rng.choice(N, K, replace=False) for _ in range(B)]).astype(np.int32)
    got = gather_rows(jnp.asarray(buf), jnp.asarray(idx), interpret=True)
    want = np.stack([buf[b][idx[b]] for b in range(B)])
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gate_group_in_kernel_topk(rng):
    """cov=None (in-kernel bit-bisection top-k) selects exactly the
    lax.top_k set: outputs match the cov-input path bit-for-bit."""
    import jax

    from eventful_transformer_tpu.core.indexing import coverage
    from eventful_transformer_tpu.ops.pallas.gate_group import (
        gate_group_linear,
        gate_group_mlp,
        LN_EPS,
    )

    B, N, C, F, K = 2, 24, 64, 128, 9
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x, p, b = f32(B, N, C), f32(B, N, C), f32(B, N, F)
    scale, bias = f32(C), f32(C)
    w, wb = f32(C, F) * 0.02, f32(F)

    def ln(v):
        m = v.mean(-1, keepdims=True)
        var = jnp.square(v - m).mean(-1, keepdims=True)
        return (v - m) * jax.lax.rsqrt(var + LN_EPS) * scale + bias

    interp = jax.devices()[0].platform == "cpu"
    norms = jnp.linalg.norm(ln(x) - p, axis=-1)
    _, idx = jax.lax.top_k(norms, K)
    cov = coverage(idx.astype(jnp.int32), None, N, 3)
    kw = dict(ln_mode="post", kcap=K, interpret=interp)
    p_ref, y_ref = gate_group_linear(x, p, b, cov, scale, bias, w, wb, **kw)
    p2, y2 = gate_group_linear(x, p, b, None, scale, bias, w, wb, **kw)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref), rtol=1e-6, atol=1e-6)

    w1, b1, w2, b2 = f32(C, 2 * C) * 0.02, f32(2 * C), f32(2 * C, C) * 0.02, f32(C)
    bm = f32(B, N, C)
    r_ref = gate_group_mlp(x, p, bm, cov, scale, bias, w1, b1, w2, b2, **kw)
    r2 = gate_group_mlp(x, p, bm, None, scale, bias, w1, b1, w2, b2, **kw)
    for a, want in zip(r2, r_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_dense_mlp_residual_matches_unfused(rng):
    """Fused LN+MLP+residual kernel == the unfused dense path (f32,
    interpret on CPU), including FLOP-count parity."""
    import jax

    from eventful_transformer_tpu.core.blocks import Block
    from eventful_transformer_tpu.core.counting import Counts, Ctx

    blk = Block(dim=64, heads=4, mlp_ratio=2, input_size=(4, 6))
    params = blk.init(jax.numpy.zeros(2, dtype="uint32"))
    x = jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32))

    blk.fused_dense_mlp = False
    ctx_a = Ctx(count_mode=True)
    want, _ = blk.apply(ctx_a, params, {}, x)

    blk.fused_dense_mlp = True  # interpret mode on CPU
    ctx_b = Ctx(count_mode=True)
    got, _ = blk.apply(ctx_b, params, {}, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    ca = Counts.from_device(ctx_a.counts)
    cb = Counts.from_device(ctx_b.counts)
    for key in ca:
        assert cb[key] == ca[key], key


def test_coverage_from_norms_matches_topk(rng):
    """coverage_from_norms == coverage(lax.top_k indices), incl. exact
    tie-at-the-kth-value handling (top_k is stable: smallest indices win)."""
    import jax

    from eventful_transformer_tpu.core.indexing import coverage, coverage_from_norms

    for trial in range(20):
        B, N = 4, 31
        k = int(rng.integers(1, N + 1))
        norms = rng.standard_normal((B, N)).astype(np.float32) ** 2
        if trial % 2:  # force heavy ties
            norms = np.round(norms * 3.0) / 3.0
        norms = jnp.asarray(norms)
        _, idx = jax.lax.top_k(norms, k)
        want = coverage(idx.astype(jnp.int32), None, N, 3)
        got = coverage_from_norms(norms, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want)), (trial, k)


def test_count_accumulation_exact_at_vitdet_1024_scale():
    """Device-side count accumulation (Neumaier pairs, core/counting.py)
    stays float64-exact through a ViTDet-1024-scale run: 12 blocks x 250
    frames of ~1e9-1e10 increments accumulating to ~1e13, inside a
    counting.scan. A plain f32 scalar drifts measurably here."""
    import jax.numpy as jnp

    from eventful_transformer_tpu.core import counting
    from eventful_transformer_tpu.core.counting import Counts, Ctx

    # per-block increments at the ViTDet-1024 operating point (N=4096, C=768)
    increments = [
        2.0 * 4096 * 768 * 2304,  # qkv
        2.0 * 4096 * 768 * 768,   # projection
        2.0 * 4096 * 768 * 3072,  # mlp_1
        2.0 * 4096 * 3072 * 768,  # mlp_2
        4096.0 * 768,             # gate
    ]
    frames = 250

    ctx = Ctx(count_mode=True)

    def body(c, carry, _):
        for _b in range(12):
            for v in increments:
                c.add("linear_flops", v)
        return carry, jnp.zeros(())

    counting.scan(body, ctx, jnp.zeros(()), None, length=frames)
    got = Counts.from_device(ctx.counts)["linear_flops"]

    want = 0.0  # float64 reference
    for _ in range(frames):
        for _b in range(12):
            for v in increments:
                want += float(np.float32(v))  # increments are f32-rounded
    assert want > 1e13  # the regime where f32 ulp ~ 1e6
    rel = abs(got - want) / want
    assert rel < 1e-9, (got, want, rel)

    # and the naive f32 accumulation really does drift (sanity of the test)
    naive = np.float32(0.0)
    for _ in range(frames):
        for _b in range(12):
            for v in increments:
                naive = np.float32(naive + np.float32(v))
    assert abs(float(naive) - want) / want > 1e-9


def _run_block_sequence(blk, params, x_seq, n_tokens, training=False):
    """Flush + incremental steps through one eventful block; returns
    (outputs list, final state, Counts)."""
    import jax

    from eventful_transformer_tpu.core.counting import Counts, Ctx

    ctx = Ctx(count_mode=True, training=training)
    state = blk.init_state(x_seq[0].shape[0], n_tokens)
    outs = []
    for t, x in enumerate(x_seq):
        y, state = blk.apply(
            ctx, params, state, x, mode="flush" if t == 0 else "incremental"
        )
        outs.append(y)
    return outs, state, Counts.from_device(ctx.counts)


def _blocked_vs_unfused(block_cls, policy, n=32, steps=3, **overrides):
    """Blocked large-N fused path == the unfused gathered+buffered path,
    value- and count-exact (interpret mode on CPU)."""
    import copy

    import jax

    from eventful_transformer_tpu.core import blocks as blocks_mod

    rng = np.random.default_rng(3)
    B, C = 2, 64
    kwargs = dict(dim=C, heads=4, mlp_ratio=2, input_size=(4, 8))
    kwargs.update(overrides)
    blk_a = block_cls(**kwargs)
    blk_b = block_cls(**kwargs)
    for blk, mode in ((blk_a, False), (blk_b, "blocked")):
        blk.fused_gates = mode
        blk.recompute_buffers = False  # buffered twin of the blocked path
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
        for gate in getattr(blk, "v_gate", None) and [blk.v_gate, blk.matmul_gate] or []:
            gate.policy = copy.deepcopy(policy)
    params = blk_a.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(steps)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, n)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, n)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5
        )
    flat_a = jax.tree_util.tree_leaves(state_a)
    flat_b = jax.tree_util.tree_leaves(state_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(la), rtol=2e-5, atol=2e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_blocked_group_tokenwise_topk():
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    _blocked_vs_unfused(EventfulTokenwiseBlock, TokenNormTopK(k=9))


def test_blocked_group_tokenwise_threshold_mask():
    """Masked (threshold, capped-capacity) selection through the blocked
    path: invalid slots scatter nothing."""
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormThreshold

    _blocked_vs_unfused(
        EventfulTokenwiseBlock, TokenNormThreshold(threshold=3.0, capacity=12)
    )


def test_blocked_group_gate_before_ln():
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    _blocked_vs_unfused(
        EventfulTokenwiseBlock, TokenNormTopK(k=9), gate_before_ln=True
    )


def test_blocked_group_eventful_block_pooled():
    """Full EventfulBlock (incremental q-kT + delta A-V) with k/v pooling on
    the blocked tokenwise path; sorted selection indices are positionally
    equivalent (pooled dedup, forced col gates)."""
    from eventful_transformer_tpu.core.blocks import EventfulBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    _blocked_vs_unfused(EventfulBlock, TokenNormTopK(k=9), pool_size=2)


def test_blocked_group_full_scale_n4096():
    """Blocked kernels at the ViTDet-1024 token count (N=4096 — the regime
    the blocked path exists for, reference blocks.py:399-463): golden vs
    the unfused gathered+buffered path at full N so the tile/grid logic
    (row blocks, rank compaction across block boundaries) is exercised,
    not just the small-shape variant. Slim width keeps interpret-mode
    runtime tractable; marked slow."""
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    _blocked_vs_unfused(
        EventfulTokenwiseBlock,
        TokenNormTopK(k=256),
        n=4096,
        steps=2,
        dim=64,
        heads=2,
        mlp_ratio=1,
        input_size=(64, 64),
    )


def _windowed_resident_case(input_size, window_size, gate_before_ln=False,
                            fused_mode="blocked", force_window_kernel=False,
                            training=False):
    """Window-resident qkv buffer (blocked mode, windowed tokenwise block,
    core/blocks.py window_resident_qkv): outputs and counts match the
    unfused path, and the resident window-major buffer equals the unfused
    row-major buffer under the static window permutation, with pad rows
    holding the qkv bias row (reference blocks.py:269-287)."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(11)
    B, C = 2, 64
    n = input_size[0] * input_size[1]
    kwargs = dict(
        dim=C, heads=4, mlp_ratio=2, input_size=input_size,
        window_size=window_size, gate_before_ln=gate_before_ln,
    )
    blk_a = EventfulTokenwiseBlock(**kwargs)
    blk_b = EventfulTokenwiseBlock(**kwargs)
    for blk, mode in ((blk_a, False), (blk_b, fused_mode)):
        blk.fused_gates = mode
        blk.recompute_buffers = False
        for gate in blk.gates:
            gate.policy = copy.deepcopy(TokenNormTopK(k=7))
    if force_window_kernel:
        # exercise the pre_partitioned kernel branch (pad rows supply the
        # bias instead of in-kernel geom substitution) in interpret mode
        blk_b.fused_window_attention = True
    assert blk_b._resident_qkv(n) and not blk_a._resident_qkv(n)
    params = blk_a.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(
        blk_a, params, x_seq, n, training=training
    )
    outs_b, state_b, counts_b = _run_block_sequence(
        blk_b, params, x_seq, n, training=training
    )
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key
    # the resident buffer is the unfused buffer under the window permutation
    perm, _ = blk_b._window_perm()
    b_w = np.asarray(state_b["qkv_accumulator"]["b"])  # (B, NW, 3C)
    b_r = np.asarray(state_a["qkv_accumulator"]["b"])  # (B, N, 3C)
    valid = perm < n
    np.testing.assert_allclose(
        b_w[:, valid], b_r[:, perm[valid]], rtol=2e-5, atol=2e-5
    )
    if not valid.all():
        pad_rows = b_w[:, ~valid]
        bias = np.asarray(params["qkv"]["bias"])
        np.testing.assert_allclose(
            pad_rows, np.broadcast_to(bias, pad_rows.shape), rtol=1e-6, atol=1e-6
        )
    # gate state stays row-major and matched
    np.testing.assert_allclose(
        np.asarray(state_b["qkv_gate"]["p"]),
        np.asarray(state_a["qkv_gate"]["p"]),
        rtol=2e-5, atol=2e-5,
    )


def test_blocked_group_windowed_resident_unpadded():
    _windowed_resident_case((4, 6), (2, 3))


def test_blocked_group_windowed_resident_padded():
    _windowed_resident_case((4, 5), (2, 3))


def test_blocked_group_windowed_resident_gate_before_ln():
    _windowed_resident_case((4, 5), (2, 3), gate_before_ln=True)


def test_v2_group_windowed_resident():
    """v2 whole-group mode with a windowed block routes the qkv group
    through the resident blocked select/scatter pair (proj/MLP stay on the
    v2 kernels); parity vs the unfused path."""
    _windowed_resident_case((4, 5), (2, 3), fused_mode="v2")


def test_windowed_resident_window_kernel_pre_partitioned():
    """The production TPU attention branch of the resident path
    (_forward_attention with pre_partitioned=True feeding the fused
    window-attention kernel, pad rows supplying the qkv bias) in interpret
    mode — conftest's forced CPU otherwise leaves fused_window_attention
    'auto' off and only the XLA fallthrough runs in CI."""
    _windowed_resident_case((4, 5), (2, 3), force_window_kernel=True)


def test_windowed_resident_training_fallback():
    """ctx.training forces the unfused differentiable path while the
    resident qkv state stays window-major: the de-permute -> unfused
    update -> re-partition bridge in _apply_incremental must match the
    row-major unfused twin exactly (values, counts, buffer layout) instead
    of raising (round-4 advisor finding, core/blocks.py)."""
    _windowed_resident_case((4, 5), (2, 3), training=True)
    _windowed_resident_case((4, 6), (2, 3), training=True)


def test_av_recompute_matches_delta_accumulator():
    """EventfulBlock.recompute_av: the A-V product recomputed as
    p_a @ p_v equals the reference's delta-accumulated product (pure
    memoization — the update telescopes), with identical FLOP counts."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(7)
    B, n, C = 2, 32, 64
    kwargs = dict(dim=C, heads=4, mlp_ratio=2, input_size=(4, 8), pool_size=2)
    blk_a = EventfulBlock(**kwargs)
    blk_b = EventfulBlock(**kwargs)
    policy = TokenNormTopK(k=9)
    for blk, rec in ((blk_a, False), (blk_b, True)):
        blk.recompute_av = rec
        blk.fused_gates = False
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    params = blk_a.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(4)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, n)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, n)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5
        )
    # gate reference states agree; the accumulator state no longer exists
    for key in ("v_gate", "matmul_gate"):
        np.testing.assert_allclose(
            np.asarray(state_b[key]["p"]), np.asarray(state_a[key]["p"]),
            rtol=2e-5, atol=2e-5,
        )
    assert "matmul_accumulator_2" not in state_b
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_av_softmax_kernel_matches_unfused():
    """The fused softmax->select->matmul A-V kernel == the unfused
    recompute_av chain (softmax in f32 vs working dtype: tolerance)."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(11)
    B, n, C = 2, 32, 64
    kwargs = dict(dim=C, heads=4, mlp_ratio=2, input_size=(4, 8), pool_size=2)
    blk_a = EventfulBlock(**kwargs)
    blk_b = EventfulBlock(**kwargs)
    policy = TokenNormTopK(k=9)
    for blk, use_kernel in ((blk_a, False), (blk_b, True)):
        blk.av_kernel = use_kernel
        blk.fuse_matmul_1 = use_kernel  # exercise in-kernel matmul-1 too
        blk.fused_gates = False
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    params = blk_a.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, n)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, n)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    for key in ("v_gate", "matmul_gate"):
        np.testing.assert_allclose(
            np.asarray(state_b[key]["p"]), np.asarray(state_a[key]["p"]),
            rtol=5e-5, atol=5e-5,
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_av_softmax_kernel_fused_relpos_bias():
    """A-V kernel with the rel-pos bias computed in-kernel == the unfused
    chain (XLA bias -> softmax -> select -> matmul), counts included."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(13)
    B, n, C = 2, 32, 64
    kwargs = dict(
        dim=C, heads=4, mlp_ratio=2, input_size=(4, 8), pool_size=2,
        relative_embedding_size=[4, 8],
    )
    blk_a = EventfulBlock(**kwargs)
    blk_b = EventfulBlock(**kwargs)
    policy = TokenNormTopK(k=9)
    for blk, use_kernel in ((blk_a, False), (blk_b, True)):
        blk.av_kernel = use_kernel
        blk.fuse_matmul_1 = use_kernel  # exercise in-kernel matmul-1 too
        blk.fused_gates = False
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    params = blk_a.init(jax.random.PRNGKey(0))
    params["relative_position"] = {
        k: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) * 0.1
        for k, v in params["relative_position"].items()
    }
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, n)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, n)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_av_softmax_kernel_relpos_awkward_grid():
    """Rel-pos bias at a grid with no tile-legal whole-row block (the shape
    that forced the old in-kernel-tables formulation to fall back to XLA
    bias on materialized logits): with precomputed bias TERMS
    (RelativePositionEmbedding.bias_terms) the kernel fuses bias + matmul-1
    at ANY shape and must match the unfused chain, counts included."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK
    rng = np.random.default_rng(41)
    B, n, C = 2, 12, 64
    kwargs = dict(
        dim=C, heads=4, mlp_ratio=2, input_size=(6, 2), pool_size=2,
        relative_embedding_size=[6, 2],
    )
    blk_a = EventfulBlock(**kwargs)
    blk_b = EventfulBlock(**kwargs)
    policy = TokenNormTopK(k=5)
    for blk, use_kernel in ((blk_a, False), (blk_b, True)):
        blk.av_kernel = use_kernel
        blk.fuse_matmul_1 = use_kernel  # exercise in-kernel matmul-1 too
        blk.fused_gates = False
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    params = blk_a.init(jax.random.PRNGKey(0))
    params["relative_position"] = {
        k: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) * 0.1
        for k, v in params["relative_position"].items()
    }
    x_seq = [
        jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, n)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, n)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def _window_block_pair(block_cls, rng, relpos=True, **extra):
    """Two identical windowed blocks, fused window-attention on/off."""
    import jax

    from eventful_transformer_tpu.core import blocks as blocks_mod

    kwargs = dict(
        dim=64, heads=4, mlp_ratio=2, input_size=(4, 6), window_size=(2, 3),
    )
    kwargs.update(extra)
    if relpos:
        kwargs["relative_embedding_size"] = [2, 3]
    blk_a = getattr(blocks_mod, block_cls)(**kwargs)
    blk_b = getattr(blocks_mod, block_cls)(**kwargs)
    blk_a.fused_window_attention = False
    blk_b.fused_window_attention = True
    for blk in (blk_a, blk_b):
        blk.fused_gates = False
        blk.fused_dense_mlp = False
    params = blk_a.init(jax.random.PRNGKey(0))
    if relpos:
        params["relative_position"] = {
            k: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) * 0.2
            for k, v in params["relative_position"].items()
        }
    return blk_a, blk_b, params


def test_window_attention_kernel_dense_relpos():
    """Fused windowed attention (in-kernel rel-pos bias) == the XLA path
    (partition heads -> matmul -> bias -> softmax -> matmul), dense Block,
    values and counts."""
    import jax

    from eventful_transformer_tpu.core.counting import Counts, Ctx

    rng = np.random.default_rng(17)
    blk_a, blk_b, params = _window_block_pair("Block", rng)
    x = jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32)) * 0.5
    ctx_a, ctx_b = Ctx(count_mode=True), Ctx(count_mode=True)
    ya, _ = blk_a.apply(ctx_a, params, {}, x)
    yb, _ = blk_b.apply(ctx_b, params, {}, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5)
    counts_a = Counts.from_device(ctx_a.counts)
    counts_b = Counts.from_device(ctx_b.counts)
    assert set(counts_a.keys()) == set(counts_b.keys())
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_window_attention_kernel_dense_relpos_padded():
    """Grid kernel with window padding (the ViTDet-1024 regime: input grid
    not divisible by the window): padded tokens must equal qkv-bias rows and
    the output must match the XLA partition path exactly."""
    import jax

    from eventful_transformer_tpu.core.counting import Counts, Ctx

    rng = np.random.default_rng(29)
    blk_a, blk_b, params = _window_block_pair(
        "Block", rng, input_size=(5, 7), window_size=(2, 3)
    )
    x = jnp.asarray(rng.standard_normal((2, 35, 64)).astype(np.float32)) * 0.5
    ctx_a, ctx_b = Ctx(count_mode=True), Ctx(count_mode=True)
    ya, _ = blk_a.apply(ctx_a, params, {}, x)
    yb, _ = blk_b.apply(ctx_b, params, {}, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5)
    counts_a = Counts.from_device(ctx_a.counts)
    counts_b = Counts.from_device(ctx_b.counts)
    assert set(counts_a.keys()) == set(counts_b.keys())
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_window_attention_kernel_dense_no_relpos():
    rng = np.random.default_rng(19)
    from eventful_transformer_tpu.core.counting import Ctx

    blk_a, blk_b, params = _window_block_pair("Block", rng, relpos=False)
    x = jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32)) * 0.5
    ya, _ = blk_a.apply(Ctx(), params, {}, x)
    yb, _ = blk_b.apply(Ctx(), params, {}, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5)


def test_window_attention_kernel_no_relpos_padded():
    """In-kernel pad-bias substitution on the geom path without rel-pos."""
    rng = np.random.default_rng(37)
    from eventful_transformer_tpu.core.counting import Ctx

    blk_a, blk_b, params = _window_block_pair(
        "Block", rng, relpos=False, input_size=(5, 7), window_size=(2, 3)
    )
    x = jnp.asarray(rng.standard_normal((2, 35, 64)).astype(np.float32)) * 0.5
    ya, _ = blk_a.apply(Ctx(), params, {}, x)
    yb, _ = blk_b.apply(Ctx(), params, {}, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5)


def test_window_attention_grid_matches_partitioned():
    """The (measured-slower, kept-as-option) grid-stripe variant slices
    windows in VMEM; it must equal the partitioned kernel over the
    equivalent XLA window partition."""
    from eventful_transformer_tpu.ops.pallas.window_attention import (
        window_attention,
        window_attention_grid,
        window_bias_terms,
    )

    rng = np.random.default_rng(31)
    b, hp, wp, c, heads = 2, 4, 6, 32, 4
    wh, ww = 2, 3
    scale = float(np.sqrt(c // heads))
    x = jnp.asarray(rng.standard_normal((b, hp, wp, 3 * c)).astype(np.float32))
    yr = jnp.asarray(rng.standard_normal((wh, wh, c // heads)).astype(np.float32))
    xr = jnp.asarray(rng.standard_normal((ww, ww, c // heads)).astype(np.float32))
    xp = x.reshape(b, hp // wh, wh, wp // ww, ww, 3 * c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, 3 * c)
    ref = window_attention(
        xp, window_bias_terms(xp, yr, xr, heads), heads=heads, scale=scale,
        a=(wh, ww), p=(wh, ww), interpret=True,
    )
    ref = ref.reshape(b, hp // wh, wp // ww, wh, ww, c)
    ref = ref.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    out = window_attention_grid(
        x, yr, xr, heads=heads, scale=scale, window=(wh, ww), a=(wh, ww),
        p=(wh, ww), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    out2 = window_attention_grid(
        x, heads=heads, scale=scale, window=(wh, ww), interpret=True
    )
    ref2 = window_attention(xp, heads=heads, scale=scale, interpret=True)
    ref2 = ref2.reshape(b, hp // wh, wp // ww, wh, ww, c)
    ref2 = ref2.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5, atol=1e-5)


def test_window_attention_kernel_eventful_tokenwise():
    """Fused windowed attention under the eventful-tokenwise block: flush +
    incremental steps stay value- and count-matched to the XLA path."""
    import copy

    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(23)
    blk_a, blk_b, params = _window_block_pair("EventfulTokenwiseBlock", rng)
    policy = TokenNormTopK(k=7)
    for blk in (blk_a, blk_b):
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    x_seq = [
        jnp.asarray(rng.standard_normal((2, 24, 64)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, 24)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, 24)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def _global_block_pair(block_cls):
    """Two identical NON-windowed blocks (the ViViT spatial/temporal shape:
    global attention, no pool/ATS/cast/rel-pos), fused global attention
    on/off."""
    import jax

    from eventful_transformer_tpu.core import blocks as blocks_mod

    kwargs = dict(dim=64, heads=4, mlp_ratio=2, input_size=(4, 6))
    blk_a = getattr(blocks_mod, block_cls)(**kwargs)
    blk_b = getattr(blocks_mod, block_cls)(**kwargs)
    blk_a.fused_global_attention = False
    blk_b.fused_global_attention = True
    for blk in (blk_a, blk_b):
        blk.fused_gates = False
        blk.fused_dense_mlp = False
    return blk_a, blk_b, blk_a.init(jax.random.PRNGKey(0))


def test_global_attention_kernel_dense():
    """Fused global attention (whole sequence as one window per batch row,
    the ViViT N=197 shape) == the XLA head-split path, dense Block, values
    and counts; N=25 is a small tile-unaligned stand-in for the ViViT
    197-token (196 + class) shape."""
    from eventful_transformer_tpu.core.counting import Counts, Ctx

    rng = np.random.default_rng(41)
    blk_a, blk_b, params = _global_block_pair("Block")
    x = jnp.asarray(rng.standard_normal((2, 25, 64)).astype(np.float32)) * 0.5
    ctx_a, ctx_b = Ctx(count_mode=True), Ctx(count_mode=True)
    ya, _ = blk_a.apply(ctx_a, params, {}, x)
    yb, _ = blk_b.apply(ctx_b, params, {}, x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5)
    counts_a = Counts.from_device(ctx_a.counts)
    counts_b = Counts.from_device(ctx_b.counts)
    assert set(counts_a.keys()) == set(counts_b.keys())
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_global_attention_kernel_eventful_tokenwise():
    """Fused global attention under the eventful-tokenwise block (attention
    runs dense on the full buffer): flush + incremental steps stay value-
    and count-matched to the XLA path."""
    import copy

    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(43)
    blk_a, blk_b, params = _global_block_pair("EventfulTokenwiseBlock")
    policy = TokenNormTopK(k=9)
    for blk in (blk_a, blk_b):
        for gate in blk.gates:
            gate.policy = copy.deepcopy(policy)
    x_seq = [
        jnp.asarray(rng.standard_normal((2, 25, 64)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, 25)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, 25)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_common_erf_and_gelu_match_xla():
    """ops/pallas/common: the in-kernel rational erf matches
    jax.scipy.special.erf and gelu_exact matches
    jax.nn.gelu(approximate=False) to f32 precision on [-4, 4] (the kernel
    clips outside, where erf is +-1 to ~1e-8)."""
    import jax

    from eventful_transformer_tpu.ops.pallas.common import erf_f32, gelu_exact

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(erf_f32(x)), np.asarray(jax.scipy.special.erf(x)),
        rtol=0, atol=5e-7,
    )
    np.testing.assert_allclose(
        np.asarray(gelu_exact(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        rtol=0, atol=3e-6,  # |x| * erf_err / 2 at |x| <= 6
    )


import pytest


@pytest.mark.parametrize("fused_mode", ["v2", "v2mlp", "blocked"])
def test_gate_pass_sharing_matches_unshared(fused_mode, monkeypatch):
    """Cross-block + within-block gate-pass sharing (the proj/MLP group
    kernels emit the next gate's selection norms from the output block in
    VMEM; ViTBackbone.apply threads them into the next block's qkv select)
    == the unshared paths: outputs, states and counts. v2/blocked consumers
    take the same f32 ln-norms formulation, so parity is tight; the v2mlp
    consumer swaps an XLA norm for the kernel's (both f32, tolerance)."""
    import copy

    import jax

    from eventful_transformer_tpu.core.backbones import ViTBackbone
    from eventful_transformer_tpu.core.counting import Counts, Ctx
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    monkeypatch.setenv("EVT_UNROLL_BLOCKS", "1")  # unrolled loop = sharing path
    rng = np.random.default_rng(23)

    def build(share):
        backbone = ViTBackbone(
            block_config=dict(dim=64, heads=4, mlp_ratio=2),
            depth=3,
            position_encoding_size=[4, 8],
            input_size=(4, 8),
            block_class="EventfulTokenwiseBlock",
        )
        for blk in backbone.blocks:
            blk.fused_gates = fused_mode
            blk.share_gate_passes = share
            for gate in blk.gates:
                gate.policy = copy.deepcopy(TokenNormTopK(k=9))
        return backbone

    ref = build(False)
    shared = build(True)
    params = ref.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((2, 32, 64)).astype(np.float32)) * 0.5
        for _ in range(3)
    ]

    def run(backbone):
        state = {"blocks": [b.init_state(2, 32) for b in backbone.blocks]}
        assert "blocks" in state  # unrolled representation
        outs, counts = [], None
        ctx = Ctx(count_mode=True)
        y, state = backbone.apply(ctx, params, state, x_seq[0], mode="flush")
        outs.append(y)
        for x in x_seq[1:]:
            y, state = backbone.apply(ctx, params, state, x, mode="incremental")
            outs.append(y)
        return outs, state, Counts.from_device(ctx.counts)

    outs_a, state_a, counts_a = run(ref)
    outs_b, state_b, counts_b = run(shared)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=5e-5, atol=5e-5
        )
    flat_a = jax.tree_util.tree_leaves(state_a)
    flat_b = jax.tree_util.tree_leaves(state_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(la), rtol=5e-5, atol=5e-5
        )
    assert set(counts_a.keys()) == set(counts_b.keys())
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_window_partition_gather_matches_transpose():
    """Window partition/recombine as static row gathers == the
    pad -> reshape -> transpose chain, on a dense windowed block with
    non-dividing input (pad rows/cols) and with exact division."""
    import jax

    from eventful_transformer_tpu.core.blocks import Block
    from eventful_transformer_tpu.core.counting import Ctx

    rng = np.random.default_rng(31)
    for input_size in ((6, 8), (5, 7)):  # divides / needs padding
        kwargs = dict(
            dim=32, heads=4, mlp_ratio=2, input_size=input_size,
            window_size=[2, 4],
        )
        blk_a, blk_b = Block(**kwargs), Block(**kwargs)
        blk_a.window_partition_gather = False
        blk_b.window_partition_gather = True
        # blk_b runs the fused-kernel path (interpret on CPU) so the
        # gather-based _partition_windows_zero is exercised end-to-end
        blk_b.fused_window_attention = True
        for blk in (blk_a, blk_b):
            blk.fused_gates = False
            blk.fused_dense_mlp = False
        blk_a.fused_window_attention = False
        params = blk_a.init(jax.random.PRNGKey(0))
        n = input_size[0] * input_size[1]
        x = jnp.asarray(rng.standard_normal((2, n, 32)).astype(np.float32))
        ya, _ = blk_a.apply(Ctx(), params, {}, x)
        yb, _ = blk_b.apply(Ctx(), params, {}, x)
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5
        )


def test_wholeblock_v4_matches_unfused():
    """Whole-block resident kernel (fused_gates='v4',
    ops/pallas/block_fused.py) == the unfused select-only/recompute path
    (the v2mlp semantics it replaces), value- and count-exact over
    flush + incremental steps (interpret mode on CPU, f32)."""
    import copy

    import jax

    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock
    from eventful_transformer_tpu.core.policies import TokenNormTopK

    rng = np.random.default_rng(7)
    B, N, C = 2, 24, 64
    blk_a = EventfulTokenwiseBlock(dim=C, heads=4, mlp_ratio=2, input_size=(4, 6))
    blk_b = EventfulTokenwiseBlock(dim=C, heads=4, mlp_ratio=2, input_size=(4, 6))
    for blk, mode in ((blk_a, False), (blk_b, "v4")):
        blk.fused_gates = mode
        for gate in blk.gates:
            gate.policy = copy.deepcopy(TokenNormTopK(k=9))
    assert blk_b._v4_eligible()
    assert blk_b._fused_mode(N) == "v4"
    params = blk_a.init(jax.random.PRNGKey(0))
    x_seq = [
        jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)) * 0.5
        for _ in range(4)
    ]
    outs_a, state_a, counts_a = _run_block_sequence(blk_a, params, x_seq, N)
    outs_b, state_b, counts_b = _run_block_sequence(blk_b, params, x_seq, N)
    for ya, yb in zip(outs_a, outs_b):
        np.testing.assert_allclose(
            np.asarray(yb), np.asarray(ya), rtol=2e-5, atol=2e-5
        )
    flat_a = jax.tree_util.tree_leaves(state_a)
    flat_b = jax.tree_util.tree_leaves(state_b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(la), rtol=2e-5, atol=2e-5
        )
    for key in counts_a:
        np.testing.assert_allclose(counts_b[key], counts_a[key], rtol=1e-6), key


def test_wholeblock_v4_ineligible_falls_back():
    """Forcing 'v4' on an ineligible config (windowed) dispatches the
    v2mlp path instead of mis-running the kernel."""
    from eventful_transformer_tpu.core.blocks import EventfulTokenwiseBlock

    blk = EventfulTokenwiseBlock(
        dim=64, heads=4, mlp_ratio=2, input_size=(4, 8), window_size=[2, 2]
    )
    blk.fused_gates = "v4"
    assert not blk._v4_eligible()
    assert blk._fused_mode(32) == "v2mlp"


def test_wholeblock_v4_kernel_a_pair_branch():
    """Kernel A's 128-aligned PAIR-slice branch (dim > 256, head_dim 64 —
    the ViViT-B shape class; ops/pallas/block_fused.py) == plain jnp
    attention math, in interpret mode. The small-dim v4 block tests only
    exercise the direct-slice branch (c <= 256)."""
    import jax

    from eventful_transformer_tpu.ops.pallas.block_fused import (
        qkv_attention_group,
    )

    rng = np.random.default_rng(11)
    B, N, C, H = 2, 24, 768, 12
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x, pq, pp = f(B, N, C) * 0.5, f(B, N, C) * 0.5, f(B, N, C) * 0.5
    cov = jnp.zeros((B, N), jnp.float32).at[:, ::3].set(1.0)
    s1, b1 = f(C) * 0.1 + 1.0, f(C) * 0.1
    wqkv, bqkv = f(C, 3 * C) * 0.02, f(3 * C) * 0.02
    inv_scale = (C / H) ** -0.5

    pq2, attn, norms = qkv_attention_group(
        x, pq, cov, pp, s1, b1, wqkv, bqkv,
        heads=H, inv_scale=inv_scale, interpret=True,
    )

    # oracle
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    new1 = (x - mu) * jax.lax.rsqrt(var + 1e-6) * s1 + b1
    p1 = jnp.where(cov[..., None] > 0, new1, pq)
    qkv = p1 @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, H, C // H).transpose(0, 2, 1, 3) * inv_scale
    k = k.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, H, C // H).transpose(0, 2, 1, 3)
    a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
    ref_attn = (a @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    ref_norms = jnp.sqrt(jnp.sum((ref_attn - pp) ** 2, axis=-1))

    np.testing.assert_allclose(np.asarray(pq2), np.asarray(p1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(attn), np.asarray(ref_attn), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(norms), np.asarray(ref_norms), rtol=5e-3, atol=5e-3
    )
