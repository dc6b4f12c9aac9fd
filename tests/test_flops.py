"""utils/flops.py: StableHLO dot parsing + pass-adjusted accounting."""

import jax
import jax.numpy as jnp
import numpy as np

from dgps_with_iwvi_tpu.utils.flops import (PASSES, dot_flops_by_precision,
                                            program_cost)


class TestDotParse:
    def test_precision_groups_and_counts(self):
        hp = jax.lax.Precision.HIGHEST

        def f(a, b, c):
            x = jnp.matmul(a, b, precision=hp)            # 2*8*16*4
            y = jnp.matmul(a, b)                          # DEFAULT, same
            z = jnp.einsum("dmn,dnk->dmk", c, c[:, :16, :8],
                           precision=jax.lax.Precision.HIGH)
            return jnp.sum(x) + jnp.sum(y) + jnp.sum(z)

        a = jnp.ones((8, 16))
        b = jnp.ones((16, 4))
        c = jnp.ones((3, 16, 16))
        txt = jax.jit(f).lower(a, b, c).as_text()
        by = dot_flops_by_precision(txt)
        assert by["HIGHEST"] == 2.0 * 8 * 16 * 4
        assert by["DEFAULT"] == 2.0 * 8 * 16 * 4
        # batched: out [3,16,8], contraction 16
        assert by["HIGH"] == 2.0 * 3 * 16 * 8 * 16

    def test_program_cost_consistency(self):
        """Nominal dot total from the parse must not exceed the XLA
        cost-analysis figure, and adjusted >= nominal."""

        def f(a, b):
            return jnp.sum(jnp.matmul(
                a, b, precision=jax.lax.Precision.HIGHEST))

        a = jnp.ones((32, 64))
        b = jnp.ones((64, 16))
        cost = program_cost(jax.jit(f).lower(a, b))
        if cost["flops"] is None:  # backend without cost analysis
            return
        dots = sum(cost["dot_flops_by_precision"].values())
        assert dots <= cost["flops"] * 1.01
        expected_extra = 2.0 * 32 * 64 * 16 * (PASSES["HIGHEST"] - 1)
        np.testing.assert_allclose(
            cost["adjusted_flops"] - cost["flops"], expected_extra)
