"""S4 tests: Llama model slice — kernel-path parity, decode, quantization.

The model is the client_example-layer proof that S1-S3 kernels compose;
parity is checked kernel-path vs pure-jnp reference path, and decode-with-
cache vs full prefill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.utils.check_err import check_err

CFG_BF16 = llama.tiny_config(quant="bf16")
CFG_W4 = llama.tiny_config(quant="w4a16")
CFG_I8 = llama.tiny_config(quant="int8")

KEY = jax.random.PRNGKey(0)
PARAMS_BF16 = llama.init_weights(CFG_BF16, KEY)
TOKENS = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, CFG_BF16.vocab_size)


class TestForward:
    def test_kernel_vs_reference_path(self):
        # the whole point: Pallas kernel path == jnp reference path
        got = llama.forward(PARAMS_BF16, TOKENS, CFG_BF16, kernels=True)
        want = llama.forward(PARAMS_BF16, TOKENS, CFG_BF16, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)

    @pytest.mark.parametrize("cfg", [CFG_W4, CFG_I8], ids=["w4a16", "int8"])
    def test_quantized_paths(self, cfg):
        qp = llama.quantize_weights(PARAMS_BF16, cfg)
        got = llama.forward(qp, TOKENS, cfg, kernels=True)
        want = llama.forward(qp, TOKENS, cfg, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)

    def test_quantization_fidelity(self):
        # quantized logits should stay close to bf16 logits (perplexity
        # proxy; a random tiny model has near-uniform logits, so the metric
        # is relative error norm, not top-1 agreement)
        lf = llama.forward(PARAMS_BF16, TOKENS, CFG_BF16, kernels=False).astype(
            jnp.float32
        )
        for cfg, bound in [(CFG_I8, 0.05), (CFG_W4, 0.6)]:
            qp = llama.quantize_weights(PARAMS_BF16, cfg)
            lq = llama.forward(qp, TOKENS, cfg, kernels=False).astype(jnp.float32)
            rel = float(
                jnp.linalg.norm(lq - lf) / jnp.maximum(jnp.linalg.norm(lf), 1e-9)
            )
            assert rel < bound, f"{cfg.quant}: rel logits err {rel}"


class TestDecode:
    def test_decode_matches_prefill(self):
        """Prefill S tokens, then decode token S: logits must match a full
        prefill of S+1 tokens at the last position."""
        cfg = CFG_BF16
        toks = TOKENS[:, :32]
        nxt = TOKENS[:, 32:33]
        full = jnp.concatenate([toks, nxt], axis=1)

        _, seeds = llama.forward(PARAMS_BF16, toks, cfg, return_cache=True)
        seeded = llama.seed_kv_cache(
            llama.init_kv_cache(cfg, toks.shape[0]), seeds, cfg
        )

        got, _ = llama.decode_step(PARAMS_BF16, seeded, nxt, 32, cfg)
        want = llama.forward(PARAMS_BF16, full, cfg)[:, -1:]
        check_err(got, want, rtol=5e-2, atol=5e-2)

    def test_generate_greedy(self):
        out = llama.generate_greedy(PARAMS_BF16, TOKENS[:, :16], 4, CFG_BF16)
        assert out.shape == (2, 20)
        assert (out[:, :16] == TOKENS[:, :16]).all()

    def test_decode_w4a16(self):
        cfg = CFG_W4
        qp = llama.quantize_weights(PARAMS_BF16, cfg)
        toks = TOKENS[:, :16]
        _, seeds = llama.forward(qp, toks, cfg, return_cache=True)
        seeded = llama.seed_kv_cache(llama.init_kv_cache(cfg, 2), seeds, cfg)
        nxt = TOKENS[:, 16:17]
        got, cache2 = llama.decode_step(qp, seeded, nxt, 16, cfg)
        assert got.shape == (2, 1, cfg.vocab_size)
        assert jnp.isfinite(got.astype(jnp.float32)).all()


class TestW4A8:
    CFG = llama.tiny_config(quant="w4a8")

    def test_kernel_vs_reference_path(self):
        # norm-based gate: the kernel path uses the Pallas rmsnorm, whose
        # bf16 rounding vs the jnp norm flips per-token int8 activation
        # rounding (+-1 q-steps) — pointwise tolerances are meaningless
        # across a hard round() threshold, the aggregate error is what the
        # contract bounds.
        qp = llama.quantize_weights(PARAMS_BF16, self.CFG)
        got = llama.forward(qp, TOKENS, self.CFG, kernels=True).astype(jnp.float32)
        want = llama.forward(qp, TOKENS, self.CFG, kernels=False).astype(jnp.float32)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 0.05, rel

    def test_close_to_w4a16(self):
        # per-token int8 activations add little on top of the shared W4 error
        qp8 = llama.quantize_weights(PARAMS_BF16, self.CFG)
        qp16 = llama.quantize_weights(PARAMS_BF16, CFG_W4)
        l8 = llama.forward(qp8, TOKENS, self.CFG, kernels=False).astype(jnp.float32)
        l16 = llama.forward(qp16, TOKENS, CFG_W4, kernels=False).astype(jnp.float32)
        rel = float(jnp.linalg.norm(l8 - l16) / jnp.maximum(jnp.linalg.norm(l16), 1e-9))
        assert rel < 0.10, rel

    def test_decode(self):
        qp = llama.quantize_weights(PARAMS_BF16, self.CFG)
        toks = TOKENS[:, :16]
        _, seeds = llama.forward(qp, toks, self.CFG, return_cache=True)
        seeded = llama.seed_kv_cache(llama.init_kv_cache(self.CFG, 2), seeds, self.CFG)
        got, _ = llama.decode_step(qp, seeded, TOKENS[:, 16:17], 16, self.CFG)
        assert got.shape == (2, 1, self.CFG.vocab_size)
        assert jnp.isfinite(got.astype(jnp.float32)).all()

    def test_decode_batched_fused_norm_quant(self):
        # the E2E decode path: fused rmsnorm_quant feeds pre-quantized
        # tuples into the W4A8 linears; must track the unfused reference
        qp = llama.quantize_weights(PARAMS_BF16, self.CFG)
        toks = TOKENS[:, :16]
        _, seeds = llama.forward(qp, toks, self.CFG, return_cache=True)
        seeded = llama.seed_kv_cache(llama.init_kv_cache(self.CFG, 2), seeds, self.CFG)
        nxt = TOKENS[:, 16:17]
        pos = jnp.asarray([16, 16], jnp.int32)
        before = llama.path_counters["decode_deferred_append"]
        got, _ = llama.decode_step_batched(qp, seeded, nxt, pos, self.CFG,
                                           kernels=True)
        # path-fired (VERDICT r4 #7): the kernel side must have selected the
        # deferred-append fast path in every layer, not silently degraded to
        # the same write-then-attend path as the reference side below
        assert (llama.path_counters["decode_deferred_append"]
                >= before + self.CFG.n_layers)
        want, _ = llama.decode_step_batched(qp, seeded, nxt, pos, self.CFG,
                                            kernels=False)
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 0.05, rel


class TestPrepareParams:
    @pytest.mark.parametrize("quant", ["w4a16", "w4a8", "w8a8"])
    def test_decode_matches_unprepared(self, quant):
        # vocab 320 is not lane-aligned at its decode block -> the lm_head
        # becomes a PreparedWeights leaf (the llama-8B N=128256 case)
        cfg = llama.tiny_config(quant=quant, vocab_size=320)
        qp = llama.quantize_weights(
            llama.init_weights(cfg, jax.random.PRNGKey(3)), cfg
        )
        pp = llama.prepare_params(qp, cfg)
        from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

        assert isinstance(pp["lm_head"], PreparedWeights)
        cache = llama.init_kv_cache(cfg, 2)
        toks = TOKENS[:, :1] % cfg.vocab_size
        pos = jnp.zeros((2,), jnp.int32)
        want, c1 = llama.decode_step_batched(qp, cache, toks, pos, cfg)
        got, c2 = llama.decode_step_batched(pp, cache, toks, pos, cfg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestW8A8:
    CFG = llama.tiny_config(quant="w8a8")

    def test_kernel_vs_reference_path(self):
        qp = llama.quantize_weights(PARAMS_BF16, self.CFG)
        got = llama.forward(qp, TOKENS, self.CFG, kernels=True).astype(jnp.float32)
        want = llama.forward(qp, TOKENS, self.CFG, kernels=False).astype(jnp.float32)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 0.05, rel

    def test_close_to_int8_weight_only(self):
        # per-token int8 activations add little on top of the shared W8 error
        qp8 = llama.quantize_weights(PARAMS_BF16, self.CFG)
        qpw = llama.quantize_weights(PARAMS_BF16, CFG_I8)
        l8 = llama.forward(qp8, TOKENS, self.CFG, kernels=False).astype(jnp.float32)
        lw = llama.forward(qpw, TOKENS, CFG_I8, kernels=False).astype(jnp.float32)
        rel = float(jnp.linalg.norm(l8 - lw) / jnp.maximum(jnp.linalg.norm(lw), 1e-9))
        assert rel < 0.05, rel

    def test_decode_batched_fused_norm_quant(self):
        qp = llama.quantize_weights(PARAMS_BF16, self.CFG)
        toks = TOKENS[:, :16]
        _, seeds = llama.forward(qp, toks, self.CFG, return_cache=True)
        seeded = llama.seed_kv_cache(llama.init_kv_cache(self.CFG, 2), seeds, self.CFG)
        nxt = TOKENS[:, 16:17]
        pos = jnp.asarray([16, 16], jnp.int32)
        before = llama.path_counters["decode_deferred_append"]
        got, _ = llama.decode_step_batched(qp, seeded, nxt, pos, self.CFG,
                                           kernels=True)
        # path-fired (VERDICT r4 #7): the kernel side must have selected the
        # deferred-append fast path in every layer, not silently degraded to
        # the same write-then-attend path as the reference side below
        assert (llama.path_counters["decode_deferred_append"]
                >= before + self.CFG.n_layers)
        want, _ = llama.decode_step_batched(qp, seeded, nxt, pos, self.CFG,
                                            kernels=False)
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 0.05, rel


class TestQwen2Bias:
    CFG = llama.tiny_config(quant="bf16", dtype="float32", qkv_bias=True)
    PARAMS = llama.init_weights(CFG, KEY)

    def test_bias_changes_output(self):
        # dropped-bias wiring would make these equal
        import dataclasses

        nob = dataclasses.replace(self.CFG, qkv_bias=False)
        p0 = {**self.PARAMS, "layers": [
            {k: v for k, v in l.items() if k not in ("bq", "bk", "bv")}
            for l in self.PARAMS["layers"]
        ]}
        with_b = llama.forward(self.PARAMS, TOKENS, self.CFG, kernels=False)
        without = llama.forward(p0, TOKENS, nob, kernels=False)
        assert float(jnp.linalg.norm(with_b - without)) > 1e-3

    def test_kernel_vs_reference_path(self):
        got = llama.forward(self.PARAMS, TOKENS, self.CFG, kernels=True)
        want = llama.forward(self.PARAMS, TOKENS, self.CFG, kernels=False)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 1e-3, rel

    def test_decode_consistent_with_prefill(self):
        full = llama.forward(self.PARAMS, TOKENS[:, :17], self.CFG)
        _, seeds = llama.forward(self.PARAMS, TOKENS[:, :16], self.CFG,
                                 return_cache=True)
        cache = llama.seed_kv_cache(
            llama.init_kv_cache(self.CFG, 2), seeds, self.CFG
        )
        got, _ = llama.decode_step(self.PARAMS, cache, TOKENS[:, 16:17], 16,
                                   self.CFG)
        g = np.asarray(got[:, -1], np.float32)
        w = np.asarray(full[:, -1], np.float32)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 1e-3, rel

    def test_fused_qkv_concats_bias(self):
        cfg_f = llama.tiny_config(quant="w4a16", qkv_bias=True, fuse_qkv=True)
        cfg_b = llama.tiny_config(quant="bf16", qkv_bias=True)
        params = llama.init_weights(cfg_b, KEY)
        qp = llama.quantize_weights(params, cfg_f)
        assert "bqkv" in qp["layers"][0]
        toks = TOKENS[:, :12]
        out = llama.forward(qp, toks, cfg_f, kernels=True)
        # same quant, unfused: bias must land identically (up to the fused
        # GEMM's group-boundary quantization differences)
        cfg_u = llama.tiny_config(quant="w4a16", qkv_bias=True)
        qu = llama.quantize_weights(params, cfg_u)
        want = llama.forward(qu, toks, cfg_u, kernels=True)
        g = np.asarray(out, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 0.05, rel


class TestFusedProjections:
    def test_fused_matches_unfused(self):
        cfg_f = llama.tiny_config(quant="w4a16", fuse_qkv=True)
        cfg_u = llama.tiny_config(quant="w4a16")
        qp_f = llama.quantize_weights(PARAMS_BF16, cfg_f)
        qp_u = llama.quantize_weights(PARAMS_BF16, cfg_u)
        assert "wqkv" in qp_f["layers"][0] and "w_gateup" in qp_f["layers"][0]
        got = llama.forward(qp_f, TOKENS, cfg_f, kernels=False)
        want = llama.forward(qp_u, TOKENS, cfg_u, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)

    def test_fused_kernel_path(self):
        cfg_f = llama.tiny_config(quant="w4a16", fuse_qkv=True)
        qp_f = llama.quantize_weights(PARAMS_BF16, cfg_f)
        got = llama.forward(qp_f, TOKENS, cfg_f, kernels=True)
        want = llama.forward(qp_f, TOKENS, cfg_f, kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)


class TestInt8KVCache:
    def test_decode_int8_kv_close_to_bf16(self):
        cfg8 = llama.tiny_config(quant="bf16", kv_quant="int8")
        cfg16 = llama.tiny_config(quant="bf16")
        toks = TOKENS[:, :24]
        nxt = TOKENS[:, 24:25]
        _, seeds = llama.forward(PARAMS_BF16, toks, cfg16, return_cache=True)
        c8 = llama.seed_kv_cache(llama.init_kv_cache(cfg8, 2), seeds, cfg8)
        c16 = llama.seed_kv_cache(llama.init_kv_cache(cfg16, 2), seeds, cfg16)
        assert c8[0]["k"].dtype == jnp.int8
        got, _ = llama.decode_step(PARAMS_BF16, c8, nxt, 24, cfg8)
        want, _ = llama.decode_step(PARAMS_BF16, c16, nxt, 24, cfg16)
        check_err(got, want, rtol=1e-1, atol=1e-1)

    def test_batched_decode_int8(self):
        cfg8 = llama.tiny_config(quant="bf16", kv_quant="int8")
        cache = llama.init_kv_cache(cfg8, 2)
        toks = TOKENS[:, :1]
        pos = jnp.asarray([0, 0], jnp.int32)
        logits, cache2 = llama.decode_step_batched(
            PARAMS_BF16, cache, toks, pos, cfg8
        )
        assert jnp.isfinite(logits.astype(jnp.float32)).all()
        assert cache2[0]["k"].dtype == jnp.int8


class TestChunkedPrefill:
    def test_chunked_equals_full_prefill(self):
        """Prompt processed in chunks must produce the same last-position
        logits and cache-driven next step as one-shot prefill."""
        cfg = CFG_BF16
        toks = TOKENS[:, :32]
        # one-shot
        full_logits, seeds = llama.forward(
            PARAMS_BF16, toks, cfg, return_cache=True
        )
        full_cache = llama.seed_kv_cache(llama.init_kv_cache(cfg, 2), seeds, cfg)
        # chunked: 4 chunks of 8
        cache = llama.init_kv_cache(cfg, 2)
        for i in range(4):
            chunk = toks[:, i * 8 : (i + 1) * 8]
            logits, cache = llama.prefill_chunk_step(
                PARAMS_BF16, cache, chunk, i * 8, cfg
            )
        check_err(logits[:, -1], full_logits[:, -1], rtol=6e-2, atol=6e-2)
        # caches must agree on the written prefix
        for kv_c, kv_f in zip(cache, full_cache):
            check_err(
                kv_c["k"][:, :, :32].astype(jnp.float32),
                kv_f["k"][:, :, :32].astype(jnp.float32),
                rtol=6e-2, atol=6e-2,
            )
        # and drive one decode step from each cache: same next logits
        nxt = TOKENS[:, 32:33]
        g1, _ = llama.decode_step(PARAMS_BF16, cache, nxt, 32, cfg)
        g2, _ = llama.decode_step(PARAMS_BF16, full_cache, nxt, 32, cfg)
        check_err(g1, g2, rtol=6e-2, atol=6e-2)

    def test_chunked_reference_path(self):
        cfg = CFG_BF16
        toks = TOKENS[:, :16]
        cache = llama.init_kv_cache(cfg, 2)
        lg_k = lg_r = None
        cache_k = cache_r = cache
        for i in range(2):
            chunk = toks[:, i * 8 : (i + 1) * 8]
            lg_k, cache_k = llama.prefill_chunk_step(
                PARAMS_BF16, cache_k, chunk, i * 8, cfg, kernels=True
            )
            lg_r, cache_r = llama.prefill_chunk_step(
                PARAMS_BF16, cache_r, chunk, i * 8, cfg, kernels=False
            )
        check_err(lg_k, lg_r, rtol=6e-2, atol=6e-2)


class TestSlidingWindow:
    """Mistral-family: Llama stack + sliding-window attention."""

    def test_window_ge_seq_equals_full(self):
        cfg_w = llama.tiny_config(quant="bf16", dtype="float32",
                                  sliding_window=256)
        cfg_f = llama.tiny_config(quant="bf16", dtype="float32")
        params = llama.init_weights(cfg_f, jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0,
                                  cfg_f.vocab_size)
        a = llama.forward(params, toks, cfg_w, kernels=False)
        b = llama.forward(params, toks, cfg_f, kernels=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    def test_kernel_vs_reference_prefill(self):
        cfg = llama.tiny_config(quant="bf16", dtype="float32",
                                sliding_window=8)
        params = llama.init_weights(cfg, jax.random.PRNGKey(2))
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 48), 0,
                                  cfg.vocab_size)
        got = llama.forward(params, toks, cfg, kernels=True)
        want = llama.forward(params, toks, cfg, kernels=False)
        check_err(got, want, rtol=3e-2, atol=3e-2)

    def test_decode_matches_prefill_window(self):
        """Greedy decode with a window reproduces teacher-forced argmax."""
        cfg = llama.tiny_config(quant="bf16", dtype="float32",
                                sliding_window=8, n_layers=2)
        params = llama.init_weights(cfg, jax.random.PRNGKey(4))
        prompt = jax.random.randint(jax.random.PRNGKey(5), (1, 12), 0,
                                    cfg.vocab_size)
        n_steps = 6
        toks = llama.generate_greedy(params, prompt, n_steps, cfg,
                                     interpret=True)
        # teacher-forced check: feeding the generated prefix through the
        # windowed prefill must reproduce each decoded token's argmax
        logits = llama.forward(params, toks[:, :-1], cfg, kernels=False)
        for i in range(n_steps):
            pos = prompt.shape[1] - 1 + i
            want = int(jnp.argmax(logits[0, pos]))
            assert int(toks[0, pos + 1]) == want, (i, int(toks[0, pos + 1]), want)

    def test_mistral7b_config(self):
        cfg = llama.mistral7b(n_layers=2)
        assert cfg.sliding_window == 4096 and cfg.n_kv_heads == 8


class TestForwardVarlen:
    """Packed group-mode prefill (forward_varlen) vs per-prompt forward."""

    LENS = [37, 200, 130]

    def _packed(self, cfg):
        from composable_kernel_tpu.ops.attention import pack_varlen

        rng = jax.random.PRNGKey(7)
        prompts = [
            jax.random.randint(jax.random.fold_in(rng, i), (L,), 0,
                               cfg.vocab_size, jnp.int32)
            for i, L in enumerate(self.LENS)
        ]
        toks, starts, lens = pack_varlen(prompts, 128)
        return prompts, toks, starts, lens

    @pytest.mark.parametrize("quant", ["bf16", "w4a8"])
    def test_last_logits_match_per_prompt_forward(self, quant):
        cfg = llama.tiny_config(quant=quant, dtype="float32"
                                if quant == "bf16" else "bfloat16")
        params = llama.init_weights(cfg, KEY)
        if quant != "bf16":
            params = llama.quantize_weights(params, cfg)
        prompts, toks, starts, lens = self._packed(cfg)
        got, seeds = llama.forward_varlen(
            params, toks, starts, lens, cfg, block=128, block_q=128,
            block_k=128, return_cache=True,
        )
        assert got.shape == (len(self.LENS), cfg.vocab_size)
        def _agg(a, b):
            # w4a8's per-token int8 round is a hard threshold: tile-shape
            # rounding differences between the varlen and dense attention
            # kernels flip +-1 q-steps, so the contract is aggregate error
            # (TestW4A8 docstring), pointwise for bf16
            if quant == "bf16":
                check_err(a, b, rtol=6e-2, atol=6e-2)
            else:
                af = np.asarray(a, np.float32)
                bf = np.asarray(b, np.float32)
                rel = np.linalg.norm(af - bf) / max(np.linalg.norm(bf), 1e-9)
                assert rel < 0.05, rel

        for i, p in enumerate(prompts):
            want, want_seeds = llama.forward(
                params, p[None], cfg, return_cache=True
            )
            _agg(got[i], want[0, -1])
            # packed KV seed slices must match the per-prompt prefill KV
            s0, li = int(starts[i]), int(lens[i])
            for (kp, vp), (kw, vw) in zip(seeds, want_seeds):
                _agg(kp[s0 : s0 + li].transpose(1, 0, 2), kw[0])
                _agg(vp[s0 : s0 + li].transpose(1, 0, 2), vw[0])

    def test_reference_path(self):
        cfg = llama.tiny_config(quant="bf16", dtype="float32")
        params = llama.init_weights(cfg, KEY)
        _, toks, starts, lens = self._packed(cfg)
        got = llama.forward_varlen(params, toks, starts, lens, cfg,
                                   block=128, block_q=128, block_k=128)
        want = llama.forward_varlen(params, toks, starts, lens, cfg,
                                    block=128, block_q=128, block_k=128,
                                    kernels=False)
        check_err(got, want, rtol=6e-2, atol=6e-2)


class TestPackedChunkedPrefill:
    """prefill_chunk_step_packed: packed ragged chunk rounds (the
    composition of the group-mode varlen pack with chunked prefill —
    finished prompts drop out of later rounds)."""

    C = 128

    def _run_packed(self, cfg, params, prompts, n_slots, kernels=True):
        c = self.C
        lens_full = [p.shape[0] for p in prompts]
        cache = llama.init_kv_cache(cfg, n_slots)
        n_rounds = -(-max(lens_full) // c)
        last_logits = [None] * len(prompts)
        for j in range(n_rounds):
            live = [i for i, L in enumerate(lens_full) if L > j * c]
            e_n = len(live)
            toks = np.zeros((e_n, c), np.int32)
            lens = np.zeros((e_n,), np.int32)
            for e, i in enumerate(live):
                li = min(c, lens_full[i] - j * c)
                toks[e, :li] = np.asarray(prompts[i][j * c : j * c + li])
                lens[e] = li
            slots = np.asarray(live, np.int32)
            pos = np.full((e_n,), j * c, np.int32)
            logits, cache = llama.prefill_chunk_step_packed(
                params, cache, jnp.asarray(toks), jnp.asarray(lens),
                jnp.asarray(slots), jnp.asarray(pos), cfg,
                kernels=kernels, calibrate_scales=(j == 0),
            )
            for e, i in enumerate(live):
                if (lens_full[i] - 1) // c == j:
                    last_logits[i] = logits[e]
        return last_logits, cache

    def test_matches_full_prefill_bf16(self):
        cfg = CFG_BF16
        rng = jax.random.PRNGKey(5)
        lens_full = [200, 130, 96]
        prompts = [
            jax.random.randint(jax.random.fold_in(rng, i), (L,), 0,
                               cfg.vocab_size)
            for i, L in enumerate(lens_full)
        ]
        last_logits, cache = self._run_packed(cfg, PARAMS_BF16, prompts, 3)

        for i, (L, p) in enumerate(zip(lens_full, prompts)):
            full_logits, seeds = llama.forward(
                PARAMS_BF16, p[None], cfg, return_cache=True
            )
            check_err(last_logits[i], full_logits[0, -1], rtol=6e-2,
                      atol=6e-2, msg=f"prompt {i} last logits")
            # cache prefix parity for this slot
            full_cache = llama.seed_kv_cache(
                llama.init_kv_cache(cfg, 1), seeds, cfg
            )
            for kv_c, kv_f in zip(cache, full_cache):
                check_err(
                    kv_c["k"][i, :, :L].astype(jnp.float32),
                    kv_f["k"][0, :, :L].astype(jnp.float32),
                    rtol=6e-2, atol=6e-2, msg=f"prompt {i} cache",
                )

        # decode continuation from the packed-built cache vs full-prefill
        nxt = jnp.asarray([[3], [7], [11]], jnp.int32)
        pos_v = jnp.asarray(lens_full, jnp.int32)
        g1, _ = llama.decode_step_batched(
            PARAMS_BF16, cache, nxt, pos_v, cfg
        )
        for i, p in enumerate(prompts):
            _, seeds = llama.forward(PARAMS_BF16, p[None], cfg,
                                     return_cache=True)
            fc = llama.seed_kv_cache(llama.init_kv_cache(cfg, 1), seeds, cfg)
            g2, _ = llama.decode_step_batched(
                PARAMS_BF16, fc, nxt[i : i + 1], pos_v[i : i + 1], cfg
            )
            check_err(g1[i], g2[0], rtol=6e-2, atol=6e-2,
                      msg=f"prompt {i} decode continuation")

    def test_int8_kv_matches_padded_chunk_wave(self):
        cfg = llama.tiny_config(quant="bf16", kv_quant="int8")
        params = PARAMS_BF16
        rng = jax.random.PRNGKey(6)
        lens_full = [256, 140]
        prompts = [
            jax.random.randint(jax.random.fold_in(rng, i), (L,), 0,
                               cfg.vocab_size)
            for i, L in enumerate(lens_full)
        ]
        last_logits, cache = self._run_packed(cfg, params, prompts, 2)
        for i, (L, p) in enumerate(zip(lens_full, prompts)):
            # per-request padded chunk loop (the trusted path)
            c1 = llama.init_kv_cache(cfg, 1)
            lg = None
            for j in range(-(-L // self.C)):
                li = min(self.C, L - j * self.C)
                chunk = jnp.zeros((1, self.C), jnp.int32)
                chunk = chunk.at[0, :li].set(p[j * self.C : j * self.C + li])
                lg, c1 = llama.prefill_chunk_step(
                    params, c1, chunk, j * self.C, cfg,
                    calibrate_scales=(j == 0),
                )
                if (L - 1) // self.C == j:
                    lg = lg[0, (L - 1) % self.C]
            check_err(last_logits[i], lg, rtol=8e-2, atol=8e-2,
                      msg=f"prompt {i}")

    def test_bucket_padding_entry_is_inert(self):
        cfg = CFG_BF16
        rng = jax.random.PRNGKey(7)
        p0 = jax.random.randint(rng, (100,), 0, cfg.vocab_size)
        # run slot 1's chunk with and without a dead padding entry
        cache_a = llama.init_kv_cache(cfg, 2)
        toks = jnp.zeros((1, self.C), jnp.int32).at[0, :100].set(p0)
        lg_a, cache_a = llama.prefill_chunk_step_packed(
            params=PARAMS_BF16, cache=cache_a, tokens=toks,
            lens=jnp.asarray([100], jnp.int32),
            slots=jnp.asarray([1], jnp.int32),
            pos=jnp.asarray([0], jnp.int32), cfg=cfg,
        )
        cache_b = llama.init_kv_cache(cfg, 2)
        toks2 = jnp.concatenate([toks, jnp.zeros_like(toks)], axis=0)
        lg_b, cache_b = llama.prefill_chunk_step_packed(
            params=PARAMS_BF16, cache=cache_b, tokens=toks2,
            lens=jnp.asarray([100, 0], jnp.int32),
            slots=jnp.asarray([1, 0], jnp.int32),
            pos=jnp.asarray([0, 0], jnp.int32), cfg=cfg,
        )
        # same logits up to bf16 retiling noise (T=128 vs 256 changes GEMM
        # block padding), and slot 0 (the dead entry's alias target) must
        # be BIT-identical — the padding entry never touches any cache
        check_err(lg_a[0], lg_b[0], rtol=2e-2, atol=2e-2)
        for kv_a, kv_b in zip(cache_a, cache_b):
            np.testing.assert_array_equal(
                np.asarray(kv_a["k"][0]), np.asarray(kv_b["k"][0])
            )
            np.testing.assert_array_equal(
                np.asarray(kv_a["v"][0]), np.asarray(kv_b["v"][0])
            )
            check_err(
                kv_a["k"][1].astype(jnp.float32),
                kv_b["k"][1].astype(jnp.float32), rtol=2e-2, atol=2e-2,
            )

    def test_kernels_reference_parity(self):
        cfg = CFG_BF16
        rng = jax.random.PRNGKey(8)
        lens_full = [160, 96]
        prompts = [
            jax.random.randint(jax.random.fold_in(rng, i), (L,), 0,
                               cfg.vocab_size)
            for i, L in enumerate(lens_full)
        ]
        lg_k, cache_k = self._run_packed(cfg, PARAMS_BF16, prompts, 2,
                                         kernels=True)
        lg_r, cache_r = self._run_packed(cfg, PARAMS_BF16, prompts, 2,
                                         kernels=False)
        for i in range(2):
            check_err(lg_k[i], lg_r[i], rtol=6e-2, atol=6e-2)
