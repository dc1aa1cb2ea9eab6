"""FLOPs accounting (profiling.py) — the numbers behind bench.py's MFU column.

The reference has no FLOPs accounting; VERDICT r2 item 4 asked for it so the
perf claims can be argued against hardware peak rather than self-history.
``analytic_flops`` counts 2*MACs for ``dot_general``/``conv_general_dilated``
by walking the jaxpr; these tests pin it to hand-computed values and to XLA's
own ``cost_analysis`` where that is available.
"""

import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.profiling import analytic_flops, flops_estimate


def test_matmul_matches_cost_analysis():
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.zeros((128, 256), jnp.float32)
    y = jnp.zeros((256, 64), jnp.float32)
    expect = 2.0 * 128 * 256 * 64
    assert analytic_flops(f, x, y) == expect
    ca = f.lower(x, y).cost_analysis()
    if ca:  # XLA's analysis is None for some module shapes; equality when present
        assert float(ca["flops"]) == expect
    assert flops_estimate(f, x, y) == expect


def test_batched_dot_general():
    f = lambda a, b: jnp.einsum("bij,bjk->bik", a, b)
    x = jnp.zeros((4, 32, 16), jnp.float32)
    y = jnp.zeros((4, 16, 8), jnp.float32)
    assert analytic_flops(f, x, y) == 2.0 * 4 * 32 * 16 * 8


def test_conv_nhwc():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    w = jnp.zeros((3, 3, 3, 16), jnp.float32)
    # out [2,8,8,16]; per-output MACs = 3*3*3
    assert analytic_flops(f, x, w) == 2.0 * (2 * 8 * 8 * 16) * (3 * 3 * 3)


def test_grouped_conv_divides_by_groups():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4,
        )
    x = jnp.zeros((1, 4, 4, 8), jnp.float32)
    w = jnp.zeros((3, 3, 2, 8), jnp.float32)  # HWIO with I = Cin/groups
    assert analytic_flops(f, x, w) == 2.0 * (1 * 4 * 4 * 8) * (3 * 3 * 2)


def test_scan_multiplies_by_length():
    def f(x):
        def body(c, _):
            return c @ x, None
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out
    x = jnp.eye(16, dtype=jnp.float32)
    assert analytic_flops(f, x) == 5 * 2.0 * 16 * 16 * 16


def test_elementwise_is_free():
    f = lambda x: jnp.tanh(x) + x * 2.0
    assert analytic_flops(f, jnp.zeros((64, 64))) == 0.0


def test_nested_jit_is_counted():
    inner = jax.jit(lambda a, b: a @ b)
    f = lambda a, b: inner(a, b) + 1.0
    x = jnp.zeros((8, 8), jnp.float32)
    assert analytic_flops(f, x, x) == 2.0 * 8 * 8 * 8
