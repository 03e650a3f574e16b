"""Mixtral-class MoE model family: Llama attention stack + top-k routed
expert FFN (models.moe) end-to-end — forward, decode, quantized experts.

Reference analog: CK's grouped-GEMM fixed-NK device op is the MoE building
block (device_grouped_gemm_fixed_nk.hpp:56); the model-level composition is
beyond the reference's scope (CK has no model zoo).
"""

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.models import llama

KEY = jax.random.PRNGKey(0)
# f32 weights: greedy/argmax parity (see test_serving.py note on bf16 ties)
CFG = llama.tiny_config(
    quant="bf16", dtype="float32", n_experts=4, top_k_experts=2
)
PARAMS = llama.init_weights(CFG, KEY)
TOKENS = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, CFG.vocab_size)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)


class TestMoEForward:
    def test_param_tree_shape(self):
        layer = PARAMS["layers"][0]
        assert "moe" in layer and "w_gate" not in layer
        assert layer["moe"]["w_gate"].shape == (4, CFG.dim, CFG.ffn_dim)
        assert layer["moe"]["router"].shape == (CFG.dim, 4)

    def test_ragged_dispatch_matches_dense_reference(self):
        # kernel path = sorted ragged grouped GEMM; reference path = dense
        # one-hot einsum — identical routing, same math
        got = llama.forward(PARAMS, TOKENS, CFG, kernels=True)
        want = llama.forward(PARAMS, TOKENS, CFG, kernels=False)
        assert _rel(got, want) < 2e-3, _rel(got, want)

    def test_decode_step_matches_reference_path(self):
        _, seeds = llama.forward(PARAMS, TOKENS[:, :16], CFG, return_cache=True)
        cache = llama.seed_kv_cache(llama.init_kv_cache(CFG, 2), seeds, CFG)
        nxt = TOKENS[:, 16:17]
        pos = jnp.asarray([16, 16], jnp.int32)
        got, _ = llama.decode_step_batched(PARAMS, cache, nxt, pos, CFG,
                                           kernels=True)
        want, _ = llama.decode_step_batched(PARAMS, cache, nxt, pos, CFG,
                                            kernels=False)
        assert _rel(got, want) < 2e-3, _rel(got, want)

    def test_decode_consistent_with_prefill(self):
        # greedy next token from decode == greedy next token from a longer
        # prefill (cache correctness through the MoE layers)
        full = llama.forward(PARAMS, TOKENS[:, :17], CFG)
        _, seeds = llama.forward(PARAMS, TOKENS[:, :16], CFG, return_cache=True)
        cache = llama.seed_kv_cache(llama.init_kv_cache(CFG, 2), seeds, CFG)
        got, _ = llama.decode_step(PARAMS, cache, TOKENS[:, 16:17], 16, CFG)
        assert _rel(got[:, -1], full[:, -1]) < 2e-3


class TestMoEQuantized:
    def test_int8_experts_close_to_bf16(self):
        cfg = llama.tiny_config(quant="int8", dtype="float32", n_experts=4)
        qp = llama.quantize_weights(PARAMS, cfg)
        lq = llama.forward(qp, TOKENS, cfg, kernels=True)
        lf = llama.forward(PARAMS, TOKENS, CFG, kernels=True)
        assert _rel(lq, lf) < 0.05, _rel(lq, lf)

    def test_int8_kernel_vs_reference_path(self):
        cfg = llama.tiny_config(quant="int8", dtype="float32", n_experts=4)
        qp = llama.quantize_weights(PARAMS, cfg)
        got = llama.forward(qp, TOKENS, cfg, kernels=True)
        want = llama.forward(qp, TOKENS, cfg, kernels=False)
        assert _rel(got, want) < 5e-3, _rel(got, want)

    def test_w4a8_experts_end_to_end(self):
        cfg = llama.tiny_config(quant="w4a8", n_experts=4)
        params = llama.init_weights(cfg, KEY)
        qp = llama.quantize_weights(params, cfg)
        # expert stacks carry the AND-only pack marker
        assert "gs" in qp["layers"][0]["moe"]["w_gate"]
        got = llama.forward(qp, TOKENS, cfg, kernels=True)
        want = llama.forward(qp, TOKENS, cfg, kernels=False)
        assert jnp.isfinite(got.astype(jnp.float32)).all()
        # bf16 model dtype: per-token int8 rounding flips ±1 q-steps
        # between the kernel and reference norms (see test_llama.TestW4A8
        # note) — the aggregate bound is the contract
        assert _rel(got, want) < 0.08, _rel(got, want)
