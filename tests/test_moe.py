"""MoE block tests: dense dispatch, ragged grouped-GEMM dispatch, EP sharding.

The ragged path is the CK grouped-GEMM-tile-loop analog; EP is the 'ep'
parallelism axis over a device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.models.moe import (
    MoEConfig,
    init_moe_weights,
    moe_block,
    moe_block_ep,
    moe_block_ragged,
)
from composable_kernel_tpu.utils.check_err import check_err

CFG = MoEConfig(dim=128, ffn_dim=256, n_experts=4, top_k=2)
W = init_moe_weights(CFG, jax.random.PRNGKey(0))
X = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32).astype(
    jnp.bfloat16
)


def _ref_moe(x, w, cfg):
    """Straightforward per-token loop reference."""
    xf = np.asarray(x, np.float64)
    router = np.asarray(w["router"], np.float64)
    logits = xf @ router
    out = np.zeros_like(xf)
    for t in range(x.shape[0]):
        top = np.argsort(logits[t])[::-1][: cfg.top_k]
        lw = logits[t][top]
        sw = np.exp(lw - lw.max())
        sw = sw / sw.sum()
        for wk, e in zip(sw, top):
            g = xf[t] @ np.asarray(w["w_gate"][e], np.float64)
            u = xf[t] @ np.asarray(w["w_up"][e], np.float64)
            h = g / (1 + np.exp(-g)) * u
            out[t] += wk * (h @ np.asarray(w["w_down"][e], np.float64))
    return out


class TestMoE:
    def test_dense_matches_reference(self):
        got = moe_block(X, W, CFG)
        want = _ref_moe(X, W, CFG)
        check_err(got, want, rtol=5e-2, atol=5e-2)

    def test_ragged_matches_dense(self):
        got = moe_block_ragged(X, W, CFG)
        want = moe_block(X, W, CFG)
        check_err(got, want, rtol=5e-2, atol=5e-2)

    def test_expert_parallel(self):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from composable_kernel_tpu.parallel import make_mesh

        mesh = make_mesh(tp=4, dp=1)  # 'tp' plays the ep axis here
        specs = {
            "router": P(),
            "w_gate": P("tp", None, None),
            "w_up": P("tp", None, None),
            "w_down": P("tp", None, None),
        }
        f = shard_map(
            lambda x_, w_: moe_block(x_, w_, CFG, ep_axis="tp"),
            mesh=mesh,
            in_specs=(P(), specs),
            out_specs=P(),
            check_rep=False,
        )
        got = f(X, W)
        want = moe_block(X, W, CFG)
        check_err(got, want, rtol=5e-2, atol=5e-2)

    def test_expert_parallel_all_to_all(self):
        # the real EP path: token-sharded x, capacity-bucketed all_to_all
        # dispatch, ragged local compute — must match the dense block when
        # capacity is the no-drop bound.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from composable_kernel_tpu.parallel import make_mesh

        mesh = make_mesh(tp=4, dp=1)  # 'tp' plays the ep axis here
        specs = {
            "router": P(),
            "w_gate": P("tp", None, None),
            "w_up": P("tp", None, None),
            "w_down": P("tp", None, None),
        }
        f = shard_map(
            lambda x_, w_: moe_block_ep(x_, w_, CFG, ep_axis="tp"),
            mesh=mesh,
            in_specs=(P("tp"), specs),
            out_specs=P("tp"),
            check_rep=False,
        )
        got = f(X, W)
        want = moe_block(X, W, CFG)
        check_err(got, want, rtol=5e-2, atol=5e-2)

    def test_ep_capacity_drops(self):
        # with a tiny capacity some pairs drop; the kept ones must still be
        # exact, and output magnitudes shrink, never corrupt.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from composable_kernel_tpu.parallel import make_mesh

        mesh = make_mesh(tp=4, dp=1)
        specs = {
            "router": P(),
            "w_gate": P("tp", None, None),
            "w_up": P("tp", None, None),
            "w_down": P("tp", None, None),
        }
        f = shard_map(
            lambda x_, w_: moe_block_ep(x_, w_, CFG, ep_axis="tp", capacity=4),
            mesh=mesh,
            in_specs=(P("tp"), specs),
            out_specs=P("tp"),
            check_rep=False,
        )
        got = np.asarray(f(X, W))
        assert np.all(np.isfinite(got))
        # every finite row is either 0 (dropped both experts) or bounded by
        # the dense result's scale
        dense = np.asarray(moe_block(X, W, CFG), np.float32)
        assert np.abs(got).max() <= np.abs(dense).max() * 4 + 1.0


def test_moe_quantized_experts():
    """W8A16 expert stacks through the grouped dequant GEMM ~= bf16 MoE."""
    from composable_kernel_tpu.models.moe import (
        MoEConfig, init_moe_weights, moe_block_ragged, quantize_moe_weights,
    )

    cfg = MoEConfig(dim=128, ffn_dim=256, n_experts=4, top_k=2,
                    dtype="float32")
    weights = init_moe_weights(cfg, jax.random.PRNGKey(0))
    qw = quantize_moe_weights(weights)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.dim), jnp.float32)
    got = moe_block_ragged(x, qw, cfg)
    want = moe_block_ragged(x, weights, cfg)
    check_err(got, want, rtol=4e-2, atol=4e-2)


def test_moe_w4a8_experts():
    """W4A8 expert stacks (int4 weights + per-token int8 acts on the
    grouped int8-MXU GEMM) stay close to the bf16 MoE."""
    import numpy as np

    from composable_kernel_tpu.models.moe import (
        MoEConfig, init_moe_weights, moe_block_ragged, quantize_moe_weights,
    )

    cfg = MoEConfig(dim=128, ffn_dim=256, n_experts=4, top_k=2,
                    dtype="float32")
    weights = init_moe_weights(cfg, jax.random.PRNGKey(0))
    qw = quantize_moe_weights(weights, mode="w4a8", group_size=64)
    assert qw["w_gate"]["q"].shape == (4, 64, 256)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.dim), jnp.float32)
    got = np.asarray(moe_block_ragged(x, qw, cfg), np.float32)

    # golden: the SAME int4 weights dequantized to full precision, through
    # the unquantized path — the (large, ~0.2 on gaussian weights) shared
    # W4 g=64 error cancels, leaving only the per-token int8 activation
    # quantization to bound
    from composable_kernel_tpu import dtypes

    deq = {"router": weights["router"]}
    for name in ("w_gate", "w_up", "w_down"):
        q, s, g = qw[name]["q"], qw[name]["s"], qw[name]["gs"]
        stack = []
        for i in range(q.shape[0]):
            wi = dtypes.unpack_int4_w4a8(q[i]).astype(jnp.float32)
            stack.append(wi * jnp.repeat(s[i], g, axis=0))
        deq[name] = jnp.stack(stack)
    want = np.asarray(moe_block_ragged(x, deq, cfg), np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel
