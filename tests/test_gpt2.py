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
