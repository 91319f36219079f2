"""Fused-kernel SS2D paths (projection-fused scan + merge/LN/gate epilogue)
vs the unfused reference composition — forward, gradients, param-tree
stability, and the odd-size fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.models.ss2d import SS2D
from founddiff_tpu.ops.ss2d_fused import merge_ln_gate, _merge_ln_gate_xla
from founddiff_tpu.ops.selective_scan import efficient_scan


@pytest.fixture(scope="module")
def pair():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 12, 32), jnp.float32) * 0.5
    c = jnp.asarray(rs.randn(2, 1, 256), jnp.float32)
    ref = SS2D(d_model=32, d_state=8, scan_impl="ref")
    fused = SS2D(d_model=32, d_state=8, scan_impl="pallas_fused")
    params = ref.init(jax.random.PRNGKey(0), x, c)["params"]
    return x, c, ref, fused, params


def test_param_tree_identical(pair):
    x, c, ref, fused, params = pair
    p2 = fused.init(jax.random.PRNGKey(0), x, c)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)


def test_fused_forward_matches_ref(pair):
    x, c, ref, fused, params = pair
    want = ref.apply({"params": params}, x, c)
    got = fused.apply({"params": params}, x, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # unconditioned
    np.testing.assert_allclose(
        np.asarray(fused.apply({"params": params}, x, None)),
        np.asarray(ref.apply({"params": params}, x, None)),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_grads_match_ref(pair):
    x, c, ref, fused, params = pair

    def loss(m):
        return lambda p: jnp.sum(jnp.tanh(m.apply({"params": p}, x, c)))

    gr = jax.grad(loss(ref))(params)
    gf = jax.grad(loss(fused))(params)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gr),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4, err_msg=str(ka))


def test_odd_size_falls_back(pair):
    *_, ref, fused, _ = pair
    x_odd = jnp.asarray(np.random.RandomState(2).randn(1, 7, 9, 32), np.float32)
    po = ref.init(jax.random.PRNGKey(1), x_odd, None)["params"]
    np.testing.assert_allclose(
        np.asarray(fused.apply({"params": po}, x_odd, None)),
        np.asarray(ref.apply({"params": po}, x_odd, None)),
        rtol=1e-4, atol=1e-4,
    )


def test_merge_ln_gate_op():
    rs = np.random.RandomState(3)
    B, H, W, C = 2, 8, 12, 16
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
    ys = efficient_scan(x, 2)
    z = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
    scale = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    local = jnp.asarray(rs.randn(B, C), jnp.float32)
    got = merge_ln_gate(ys, z, scale, bias, local, H=H, W=W)
    want = _merge_ln_gate_xla(ys, z, scale, bias, local, H, W, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fold_proj_matches_unfused(pair):
    """gate/residual folding (out_proj + adaLN gate + residual in the
    epilogue kernel) must equal the unfused composition, fwd and grads."""
    x, c, ref, fused, params = pair
    rs = np.random.RandomState(5)
    gate = jnp.asarray(rs.randn(2, 32), jnp.float32) * 0.3
    res = jnp.asarray(rs.randn(2, 8, 12, 32), jnp.float32)

    want = ref.apply({"params": params}, x, c, gate=gate, residual=res)
    got = fused.apply({"params": params}, x, c, gate=gate, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss(m, p):
        return jnp.sum(
            m.apply({"params": p}, x, c, gate=gate, residual=res) ** 2
        )

    g_ref = jax.grad(lambda p: loss(ref, p))(params)
    g_fused = jax.grad(lambda p: loss(fused, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        ),
        g_ref, g_fused,
    )


def test_fold_proj_param_tree_stable(pair):
    """The _DenseKernel-backed out_proj path must keep the exact param
    structure of the TorchDense path (checkpoint-converter invariant)."""
    x, c, ref, fused, params = pair
    rs = np.random.RandomState(6)
    gate = jnp.asarray(rs.randn(2, 32), jnp.float32)
    res = jnp.zeros_like(x)
    p2 = fused.init(jax.random.PRNGKey(0), x, c, gate=gate, residual=res)[
        "params"
    ]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
