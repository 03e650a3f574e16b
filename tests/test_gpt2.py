"""GPT-2 family: the kernel catalog serving a second architecture
(MHA, learned positions, biased LayerNorm, gelu MLP, tied embeddings)."""

import jax
import jax.numpy as jnp
import pytest

from composable_kernel_tpu.models import gpt2
from composable_kernel_tpu.utils.check_err import check_err

CFG = gpt2.tiny_gpt2()
PARAMS = gpt2.init_weights(CFG, jax.random.PRNGKey(0))
TOKENS = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 0, CFG.vocab_size)


class TestGPT2:
    def test_kernel_vs_reference_path(self):
        got = gpt2.forward(PARAMS, TOKENS, CFG, kernels=True)
        want = gpt2.forward(PARAMS, TOKENS, CFG, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)

    @pytest.mark.parametrize("quant", ["int8", "w4a16"])
    def test_quantized(self, quant):
        cfg = gpt2.tiny_gpt2(quant=quant)
        qp = gpt2.quantize_weights(PARAMS, cfg)
        got = gpt2.forward(qp, TOKENS, cfg, kernels=True)
        want = gpt2.forward(qp, TOKENS, cfg, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)

    def test_causality(self):
        # changing future tokens must not affect earlier logits
        t2 = TOKENS.at[:, 40:].set(0)
        a = gpt2.forward(PARAMS, TOKENS, CFG, kernels=False)
        b = gpt2.forward(PARAMS, t2, CFG, kernels=False)
        check_err(a[:, :40], b[:, :40], rtol=1e-3, atol=1e-3)


class TestGPT2GPTQ:
    def test_tree_matches_rtn_layout_and_runs(self):
        import numpy as np

        from composable_kernel_tpu.models.quantize import gptq_quantize_gpt2

        cfg_q = gpt2.tiny_gpt2(quant="w4a16", group_size=64, dtype="float32")
        cfg_f = gpt2.tiny_gpt2(quant="bf16", dtype="float32")
        params = gpt2.init_weights(cfg_f, jax.random.PRNGKey(3))
        calib = np.random.default_rng(3).integers(
            0, cfg_f.vocab_size, (4, 48)
        ).astype(np.int32)
        got = gptq_quantize_gpt2(params, cfg_q, calib)
        want = gpt2.quantize_weights(params, cfg_q)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.shape(a), np.shape(b)
            ),
            got, want,
        )
        toks = jnp.asarray(
            np.random.default_rng(4).integers(0, cfg_f.vocab_size, (2, 24)),
            jnp.int32,
        )
        lf = gpt2.forward(params, toks, cfg_f, kernels=False).astype(jnp.float32)
        lg = gpt2.forward(got, toks, cfg_q, kernels=False).astype(jnp.float32)
        lr = gpt2.forward(want, toks, cfg_q, kernels=False).astype(jnp.float32)
        err_g = float(jnp.linalg.norm(lg - lf))
        err_r = float(jnp.linalg.norm(lr - lf))
        assert np.isfinite(err_g)
        # GPTQ must not be worse than RTN (equal-ish on random weights)
        assert err_g <= 1.1 * err_r, (err_g, err_r)
