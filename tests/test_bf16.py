"""bf16 compute-path integration tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from founddiff_tpu.models import UnetRes
from founddiff_tpu.ops.selective_scan import selective_scan


def test_unet_bf16_trunk():
    model = UnetRes(
        dim=8, dim_mults=(1, 2), channels=1, num_unet=1, condition=True,
        objective="pred_res", test_res_or_noise="res", scan_impl="ref",
    )
    x32 = jnp.zeros((1, 16, 16, 2), jnp.float32)
    time = [jnp.full((1,), 5.0), jnp.full((1,), 5.0)]
    params = model.init(jax.random.PRNGKey(0), x32, time)["params"]

    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 2), jnp.bfloat16)
    out16 = model.apply({"params": p16}, x, time)[0]
    assert out16.dtype == jnp.bfloat16

    out32 = model.apply({"params": params}, x.astype(jnp.float32), time)[0]
    # bf16 trunk tracks fp32 within bf16 tolerance
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=0.1, rtol=0.1
    )


def test_scan_bf16_io():
    rng = np.random.RandomState(0)
    B, K, L, D, N = 1, 2, 40, 8, 4
    u32 = rng.randn(B, K, L, D).astype(np.float32)
    dl32 = (rng.randn(B, K, L, D) * 0.3).astype(np.float32)
    A = -np.abs(rng.randn(K, D, N)).astype(np.float32)
    Bm = rng.randn(B, K, L, N).astype(np.float32)
    Cm = rng.randn(B, K, L, N).astype(np.float32)
    Dk = rng.randn(K, D).astype(np.float32)
    bias = (rng.randn(K, D) * 0.1).astype(np.float32)

    y32 = selective_scan(u32, dl32, A, Bm, Cm, Dk, bias, impl="pallas")
    y16 = selective_scan(
        jnp.asarray(u32, jnp.bfloat16), jnp.asarray(dl32, jnp.bfloat16), A,
        jnp.asarray(Bm, jnp.bfloat16), jnp.asarray(Cm, jnp.bfloat16), Dk, bias,
        impl="pallas",
    )
    assert y16.dtype == jnp.bfloat16
    scale = np.abs(np.asarray(y32)).max()
    err = np.abs(np.asarray(y16, np.float32) - np.asarray(y32)).max()
    assert err / scale < 0.02
