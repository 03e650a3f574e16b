"""Serving engine tests: continuous batching over fixed slots.

The invariant under test: requests admitted at different times, running at
different sequence positions, produce exactly the tokens that isolated
single-request greedy decoding produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.runtime.serving import Request, ServingEngine, Watchdog

# f32 weights: bf16 logits in a random tiny model produce exact argmax
# ties that jit/eager rounding breaks differently (observed: two logits
# both 2.921875 under jit) — f32 makes greedy decoding deterministic
CFG = llama.tiny_config(quant="bf16", n_layers=2, dtype="float32")
PARAMS = llama.init_weights(CFG, jax.random.PRNGKey(0))


def _isolated_greedy(prompt, n_new):
    out = llama.generate_greedy(
        PARAMS, jnp.asarray([prompt], jnp.int32), n_new, CFG, interpret=True
    )
    return list(np.asarray(out[0, len(prompt):]))


class TestServing:
    def test_single_request_matches_isolated(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False)
        req = Request(0, [5, 9, 2, 14], max_new_tokens=6)
        eng.add(req)
        while eng.pending():
            eng.step()
        want = _isolated_greedy([5, 9, 2, 14], 6)
        assert req.output == want, (req.output, want)

    def test_staggered_admission(self):
        # second request arrives while the first is mid-decode; both must
        # match isolated decoding (slots don't interfere)
        eng = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False)
        r0 = Request(0, [1, 2, 3], max_new_tokens=8)
        eng.add(r0)
        eng.step()
        eng.step()
        r1 = Request(1, [7, 5], max_new_tokens=5)
        eng.add(r1)
        while eng.pending():
            eng.step()
        assert r0.output == _isolated_greedy([1, 2, 3], 8)
        assert r1.output == _isolated_greedy([7, 5], 5)

    def test_more_requests_than_slots(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False)
        reqs = [Request(i, [i + 1, i + 2], max_new_tokens=3) for i in range(5)]
        for r in reqs:
            eng.add(r)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
            assert steps < 100
        for r in reqs:
            assert r.done
            assert r.output == _isolated_greedy(r.prompt, 3), r.uid

    def test_eos_stops(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False)
        probe = Request(0, [3, 4], max_new_tokens=4)
        eng.add(probe)
        eng.admit()  # admission is deferred to step()/admit()
        first = probe.output[0]
        while eng.pending():
            eng.step()
        # replay with eos = the first generated token: stops immediately
        eng2 = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False)
        r = Request(1, [3, 4], max_new_tokens=10, eos_id=first)
        eng2.add(r)
        while eng2.pending():
            eng2.step()
        assert len(r.output) == 1 and r.output[0] == first


    def test_prefill_finished_surfaced_and_slot_reused(self):
        # max_new_tokens=1 requests finish during prefill; they must still
        # appear in step()'s finished list, and the slot they never occupied
        # must admit the next queued request in the same _admit pass
        eng = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False)
        r0 = Request(0, [3, 4], max_new_tokens=1)
        r1 = Request(1, [5, 6], max_new_tokens=1)
        r2 = Request(2, [1, 2, 3], max_new_tokens=3)
        for r in (r0, r1, r2):
            eng.add(r)
        finished = []
        steps = 0
        while eng.pending() or eng._prefill_finished:
            finished.extend(eng.step())
            steps += 1
            assert steps < 50
        assert r0.done and r1.done and r2.done
        assert {r.uid for r in finished} == {0, 1, 2}
        assert r0.output == _isolated_greedy([3, 4], 1)
        assert r2.output == _isolated_greedy([1, 2, 3], 3)

    def test_overlong_prompt_rejected(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False)
        too_long = list(range(CFG.max_seq_len))
        with pytest.raises(ValueError, match="max_seq_len"):
            eng.add(Request(0, too_long, max_new_tokens=8))


class TestWatchdog:
    def test_retry_then_succeed(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return jnp.ones(())

        w = Watchdog(flaky, max_retries=3)
        out = w()
        assert float(out) == 1.0 and w.failures == 2 and not w.healthy()

    def test_gives_up(self):
        w = Watchdog(lambda: (_ for _ in ()).throw(RuntimeError("dead")),
                     max_retries=1)
        with pytest.raises(RuntimeError):
            w()

    def test_slow_success_not_retried(self):
        # a slow-but-successful stateful step must NOT be re-executed (it
        # would double-advance decode); it only counts as a slow step
        calls = {"n": 0}

        def slow():
            calls["n"] += 1
            return jnp.ones(())

        w = Watchdog(slow, max_retries=3, timeout_s=1e-9)
        out = w()
        assert float(out) == 1.0
        assert calls["n"] == 1
        assert w.slow_steps == 1 and w.failures == 0 and w.healthy()


def test_chunked_prefill_matches_monolithic():
    eng_a = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False)
    eng_b = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False,
                          prefill_chunk=8)
    prompt = list(np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (24,), 0, CFG.vocab_size)
    ))
    ra = Request(0, prompt, max_new_tokens=5)
    rb = Request(0, prompt, max_new_tokens=5)
    eng_a.add(ra)
    eng_b.add(rb)
    while eng_a.pending():
        eng_a.step()
    while eng_b.pending():
        eng_b.step()
    assert ra.output == rb.output, (ra.output, rb.output)


def test_chunked_prefill_wave_matches_sequential():
    # >=2 mixed-length requests admitting together with prefill_chunk set
    # take the batched chunk-wave path; outputs must equal the per-slot
    # sequential chunk loop (single-slot engine) exactly (greedy, f32)
    prompts = [
        list(np.asarray(jax.random.randint(
            jax.random.PRNGKey(30 + i), (n,), 0, CFG.vocab_size)))
        for i, n in enumerate((24, 9, 17))
    ]
    eng = ServingEngine(PARAMS, CFG, batch_slots=3, kernels=False,
                        prefill_chunk=8)
    reqs = [Request(i, p, max_new_tokens=4) for i, p in enumerate(prompts)]
    for r in reqs:
        eng.add(r)
    while eng.pending():
        eng.step()
    # path-fired gate: the 3-request admission must have taken the
    # batched chunk-wave, not three per-request prefills
    assert eng.prefill_stats["chunk_waves"] == 1, eng.prefill_stats
    for i, (r, p) in enumerate(zip(reqs, prompts)):
        eng1 = ServingEngine(PARAMS, CFG, batch_slots=1, kernels=False,
                             prefill_chunk=8)
        r1 = Request(i, p, max_new_tokens=4)
        eng1.add(r1)
        while eng1.pending():
            eng1.step()
        assert eng1.prefill_stats["per_request"] == 1, eng1.prefill_stats
        assert r.output == r1.output, (i, r.output, r1.output)


class TestPagedServing:
    """Paged-pool engine produces identical greedy outputs to slot caches."""

    def test_single_request_matches_isolated(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False,
                            paged=True, page_size=128)
        req = Request(0, [5, 9, 2, 14], max_new_tokens=6)
        eng.add(req)
        while eng.pending():
            eng.step()
        want = _isolated_greedy([5, 9, 2, 14], 6)
        assert req.output == want, (req.output, want)

    def test_pool_pressure_and_reuse(self):
        # pool holds 2 usable pages and each request needs one -> the
        # third queues until a page frees; pages must recycle
        eng = ServingEngine(PARAMS, CFG, batch_slots=3, kernels=False,
                            paged=True, page_size=128, n_pages=3)
        reqs = [Request(i, [3 + i, 7, 11], max_new_tokens=4) for i in range(3)]
        for r in reqs:
            eng.add(r)
        eng.admit()
        assert sum(r is not None for r in eng.slot_req) == 2  # pool-limited
        assert len(eng.queue) == 1
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
            assert steps < 100
        for r in reqs:
            want = _isolated_greedy(r.prompt, 4)
            assert r.output == want, (r.uid, r.output, want)
        assert len(eng.free_pages) == 2  # all pages returned

    def test_staggered_paged(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=3, kernels=False,
                            paged=True, page_size=128)
        r0 = Request(0, [1, 2, 3, 4, 5], max_new_tokens=5)
        r1 = Request(1, [9, 8, 7], max_new_tokens=4)
        eng.add(r0)
        eng.step()
        eng.add(r1)
        while eng.pending():
            eng.step()
        assert r0.output == _isolated_greedy(r0.prompt, 5)
        assert r1.output == _isolated_greedy(r1.prompt, 4)


def test_paged_int8_kv_matches_contiguous_int8():
    """Paged int8-KV engine == slot-cache int8-KV engine token-for-token."""
    cfg8 = llama.tiny_config(quant="bf16", n_layers=2, dtype="float32",
                             kv_quant="int8")
    params = llama.init_weights(cfg8, jax.random.PRNGKey(0))
    prompt = [5, 9, 2, 14, 3]

    def run(paged):
        eng = ServingEngine(params, cfg8, batch_slots=2, kernels=False,
                            paged=paged, page_size=128)
        req = Request(0, prompt, max_new_tokens=6)
        eng.add(req)
        while eng.pending():
            eng.step()
        # path-fired: the two sides must have taken DIFFERENT decode paths
        # (VERDICT r4 #7 — the admission-bug class where a parity test
        # silently compares a path against itself)
        if paged:
            assert eng.decode_stats["paged_steps"] > 0, eng.decode_stats
            assert eng.decode_stats["dense_steps"] == 0
            assert eng.decode_stats["pages_allocated"] > 0, eng.decode_stats
        else:
            assert eng.decode_stats["dense_steps"] > 0, eng.decode_stats
            assert eng.decode_stats["paged_steps"] == 0
        return req.output

    assert run(True) == run(False)


class TestSpeculative:
    """Greedy speculative decode must EXACTLY reproduce target-only greedy."""

    def _greedy(self, params, cfg, prompt, n):
        out = llama.generate_greedy(
            params, jnp.asarray([prompt], jnp.int32), n, cfg, interpret=True
        )
        return list(np.asarray(out[0]))

    def test_self_draft_all_accepted(self):
        from composable_kernel_tpu.runtime.speculative import generate_speculative

        prompt = [5, 9, 2, 14]
        n = 10
        toks, stats = generate_speculative(
            PARAMS, CFG, PARAMS, CFG, jnp.asarray([prompt], jnp.int32), n,
            chunk=4, kernels=False,
        )
        assert list(np.asarray(toks[0])) == self._greedy(PARAMS, CFG, prompt, n)
        # a perfect draft accepts every proposal
        assert stats["accepted"] == stats["draft_steps"], stats
        # and the target ran ~n/chunk rounds, not n steps
        assert stats["rounds"] <= -(-n // 3) + 1, stats

    def test_weak_draft_still_exact(self):
        from composable_kernel_tpu.runtime.speculative import generate_speculative

        draft_params = llama.init_weights(CFG, jax.random.PRNGKey(99))
        prompt = [7, 3, 1]
        n = 9
        toks, stats = generate_speculative(
            PARAMS, CFG, draft_params, CFG, jnp.asarray([prompt], jnp.int32),
            n, chunk=4, kernels=False,
        )
        assert list(np.asarray(toks[0])) == self._greedy(PARAMS, CFG, prompt, n)

    def test_chunk_one_degrades_to_plain(self):
        from composable_kernel_tpu.runtime.speculative import generate_speculative

        prompt = [2, 4, 6]
        n = 5
        toks, stats = generate_speculative(
            PARAMS, CFG, PARAMS, CFG, jnp.asarray([prompt], jnp.int32), n,
            chunk=1, kernels=False,
        )
        assert list(np.asarray(toks[0])) == self._greedy(PARAMS, CFG, prompt, n)
        assert stats["draft_steps"] == 0


class TestSpeculativeBatched:
    """Batched draft-verify must EXACTLY reproduce per-row target greedy."""

    def _greedy_rows(self, prompts, n):
        out = llama.generate_greedy(
            PARAMS, jnp.asarray(prompts, jnp.int32), n, CFG, interpret=True
        )
        return [list(r) for r in np.asarray(out)]

    def test_self_draft_batch(self):
        from composable_kernel_tpu.runtime.speculative import (
            generate_speculative_batched,
        )

        prompts = [[5, 9, 2, 14], [1, 8, 3, 3], [30, 0, 7, 11]]
        n = 10
        toks, stats = generate_speculative_batched(
            PARAMS, CFG, PARAMS, CFG, prompts, n, chunk=4, kernels=False
        )
        assert [list(r) for r in np.asarray(toks)] == self._greedy_rows(prompts, n)
        assert stats["accepted"] == stats["draft_steps"] * 3 or stats["accepted"] > 0

    def test_weak_draft_batch_exact(self):
        # divergent per-row acceptance: rows run at different positions
        from composable_kernel_tpu.runtime.speculative import (
            generate_speculative_batched,
        )

        draft_params = llama.init_weights(CFG, jax.random.PRNGKey(99))
        prompts = [[7, 3, 1, 2], [4, 4, 4, 4]]
        n = 9
        toks, _ = generate_speculative_batched(
            PARAMS, CFG, draft_params, CFG, prompts, n, chunk=3, kernels=False
        )
        assert [list(r) for r in np.asarray(toks)] == self._greedy_rows(prompts, n)

    def test_batch_matches_per_sequence(self):
        from composable_kernel_tpu.runtime.speculative import (
            generate_speculative,
            generate_speculative_batched,
        )

        draft_params = llama.init_weights(CFG, jax.random.PRNGKey(7))
        prompts = [[2, 4, 6, 8], [9, 1, 9, 1]]
        n = 6
        got, _ = generate_speculative_batched(
            PARAMS, CFG, draft_params, CFG, prompts, n, chunk=4, kernels=False
        )
        for i, pr in enumerate(prompts):
            want, _ = generate_speculative(
                PARAMS, CFG, draft_params, CFG,
                jnp.asarray([pr], jnp.int32), n, chunk=4, kernels=False,
            )
            assert list(np.asarray(got[i])) == list(np.asarray(want[0])), i


class TestSpeculativeServing:
    """Speculative engine outputs must match the plain greedy engine."""

    def _make(self, draft_params, **kw):
        from composable_kernel_tpu.runtime.serving import (
            SpeculativeServingEngine,
        )

        return SpeculativeServingEngine(
            PARAMS, CFG, draft_params, CFG, kernels=False, **kw
        )

    def test_self_draft_matches_isolated(self):
        eng = self._make(PARAMS, batch_slots=2, spec_chunk=4)
        req = Request(0, [5, 9, 2, 14], max_new_tokens=9)
        eng.add(req)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
        assert req.output == _isolated_greedy([5, 9, 2, 14], 9)
        # perfect draft: ~n/chunk rounds, not n steps
        assert steps <= 4, steps
        assert eng.stats["accepted"] > 0

    def test_weak_draft_multi_slot_exact(self):
        draft = llama.init_weights(CFG, jax.random.PRNGKey(99))
        eng = self._make(draft, batch_slots=2, spec_chunk=3)
        reqs = [
            Request(0, [1, 2, 3], max_new_tokens=8),
            Request(1, [7, 5], max_new_tokens=5),
            Request(2, [9, 9, 1], max_new_tokens=6),  # queued behind slot
        ]
        for r in reqs:
            eng.add(r)
        while eng.pending():
            eng.step()
        assert reqs[0].output == _isolated_greedy([1, 2, 3], 8)
        assert reqs[1].output == _isolated_greedy([7, 5], 5)
        assert reqs[2].output == _isolated_greedy([9, 9, 1], 6)

    def test_eos_mid_chunk(self):
        # pick the eos from an isolated run's 3rd new token so it lands
        # inside a speculative chunk
        want = _isolated_greedy([3, 1, 4], 8)
        eos = want[2]
        eng = self._make(PARAMS, batch_slots=1, spec_chunk=4)
        req = Request(0, [3, 1, 4], max_new_tokens=8, eos_id=eos)
        eng.add(req)
        while eng.pending():
            eng.step()
        assert req.output == want[: want.index(eos) + 1]

    def test_sampled_fallback_mixed_batch(self):
        # sampled slots commit 1 token/round from the verify logits;
        # greedy slots in the SAME batch must stay exact
        eng = self._make(PARAMS, batch_slots=2, spec_chunk=3, seed=7)
        greedy = Request(0, [1, 2, 3], max_new_tokens=8)
        sampled = Request(1, [7, 5], max_new_tokens=5, temperature=0.9,
                          top_k=8)
        eng.add(greedy)
        eng.add(sampled)
        while eng.pending():
            eng.step()
        assert greedy.output == _isolated_greedy([1, 2, 3], 8)
        assert len(sampled.output) == 5
        assert all(0 <= t < CFG.vocab_size for t in sampled.output)

    def test_sampled_fallback_deterministic(self):
        def run():
            eng = self._make(PARAMS, batch_slots=1, spec_chunk=3, seed=11)
            r = Request(0, [4, 4, 8], max_new_tokens=6, temperature=0.7)
            eng.add(r)
            while eng.pending():
                eng.step()
            return r.output

        assert run() == run()


class TestSpeculativePagedServing:
    """Speculative verify composed with the page-pool cache."""

    def _make(self, draft_params, **kw):
        from composable_kernel_tpu.runtime.serving import (
            SpeculativeServingEngine,
        )

        return SpeculativeServingEngine(
            PARAMS, CFG, draft_params, CFG, kernels=False, paged=True, **kw
        )

    def test_self_draft_matches_isolated(self):
        eng = self._make(PARAMS, batch_slots=2, spec_chunk=4)
        req = Request(0, [5, 9, 2, 14], max_new_tokens=9)
        eng.add(req)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
        assert req.output == _isolated_greedy([5, 9, 2, 14], 9)
        assert steps <= 4, steps

    def test_weak_draft_pool_reuse_exact(self):
        draft = llama.init_weights(CFG, jax.random.PRNGKey(99))
        # pool sized so the third request only fits after a free
        per_req = -(-(3 + 8 + 3) // 128)
        eng = self._make(draft, batch_slots=2, spec_chunk=3,
                         n_pages=1 + 2 * per_req)
        reqs = [
            Request(0, [1, 2, 3], max_new_tokens=8),
            Request(1, [7, 5], max_new_tokens=5),
            Request(2, [9, 9, 1], max_new_tokens=6),
        ]
        for r in reqs:
            eng.add(r)
        while eng.pending():
            eng.step()
        assert reqs[0].output == _isolated_greedy([1, 2, 3], 8)
        assert reqs[1].output == _isolated_greedy([7, 5], 5)
        assert reqs[2].output == _isolated_greedy([9, 9, 1], 6)
        # all pages returned to the pool
        assert len(eng.free_pages) == 2 * per_req


class TestSampling:
    def _logits(self):
        # sharply peaked: ids 0..4 dominate in order
        base = jnp.asarray([[10.0, 8.0, 6.0, 4.0, 2.0] + [-20.0] * 27])
        return jnp.tile(base, (3, 1))

    def test_temperature_zero_is_greedy(self):
        from composable_kernel_tpu.models.sampling import sample_logits

        ids = sample_logits(self._logits(), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(ids), [0, 0, 0])

    def test_top_k_restricts_support(self):
        from composable_kernel_tpu.models.sampling import sample_logits

        lg = jnp.zeros((1, 16))  # uniform
        seen = set()
        for i in range(64):
            ids = sample_logits(
                lg, jax.random.PRNGKey(i),
                temperature=jnp.asarray([1.0]),
                top_k=jnp.asarray([4], jnp.int32),
            )
            seen.add(int(ids[0]))
        assert seen <= {0, 1, 2, 3}, seen
        assert len(seen) > 1  # actually random

    def test_top_p_keeps_nucleus(self):
        from composable_kernel_tpu.models.sampling import sample_logits

        # p(0) ~ 0.88 -> top_p=0.5 keeps only id 0
        for i in range(32):
            ids = sample_logits(
                self._logits()[:1], jax.random.PRNGKey(i),
                temperature=jnp.asarray([1.0]),
                top_p=jnp.asarray([0.5]),
            )
            assert int(ids[0]) == 0

    def test_per_slot_mixed_modes(self):
        from composable_kernel_tpu.models.sampling import sample_logits

        lg = jnp.tile(jnp.arange(32, dtype=jnp.float32)[None] * 0.1, (2, 1))
        ids = sample_logits(
            lg, jax.random.PRNGKey(3),
            temperature=jnp.asarray([0.0, 5.0]),
            top_k=jnp.asarray([0, 8], jnp.int32),
        )
        assert int(ids[0]) == 31  # greedy slot
        assert 24 <= int(ids[1]) <= 31  # sampled within top-8

    def test_serving_with_sampling(self):
        eng = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False, seed=7)
        req = Request(0, [5, 9, 2], max_new_tokens=6, temperature=0.9,
                      top_k=50, top_p=0.95)
        eng.add(req)
        while eng.pending():
            eng.step()
        assert len(req.output) == 6
        assert all(0 <= t < CFG.vocab_size for t in req.output)
        # same seed reproduces; different seed (usually) differs
        eng2 = ServingEngine(PARAMS, CFG, batch_slots=2, kernels=False, seed=7)
        req2 = Request(0, [5, 9, 2], max_new_tokens=6, temperature=0.9,
                       top_k=50, top_p=0.95)
        eng2.add(req2)
        while eng2.pending():
            eng2.step()
        assert req2.output == req.output


class TestPackedPrefill:
    """Packed-varlen (group-mode) prefill: a multi-request admission wave
    runs ONE forward_varlen; outputs must match the per-request path."""

    def _run(self, packed, paged=False, stagger=False):
        eng = ServingEngine(PARAMS, CFG, batch_slots=4, kernels=True,
                            interpret=True, packed_prefill=packed,
                            pack_block=128, paged=paged)
        reqs = [
            Request(0, [5, 9, 2, 14], max_new_tokens=5),
            Request(1, list(range(1, 40)), max_new_tokens=4),
            Request(2, [7, 5], max_new_tokens=6),
        ]
        if stagger:
            eng.add(reqs[0])
            eng.step()
            for r in reqs[1:]:
                eng.add(r)  # two admit together -> packed wave mid-flight
        else:
            for r in reqs:
                eng.add(r)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
            assert steps < 60
        # path-fired gate (VERDICT r4 #7 / the round-4 admission bug
        # class): the packed run must actually have taken the wave path,
        # the reference run must not have — otherwise this parity test
        # silently compares a path against itself.
        if packed:
            assert eng.prefill_stats["packed_waves"] >= 1, eng.prefill_stats
        else:
            assert eng.prefill_stats["packed_waves"] == 0, eng.prefill_stats
            assert eng.prefill_stats["per_request"] == len(reqs)
        return [r.output for r in reqs]

    @pytest.mark.parametrize("paged", [False, True])
    def test_matches_per_request_prefill(self, paged):
        got = self._run(packed=True, paged=paged)
        want = self._run(packed=False, paged=paged)
        assert got == want, (got, want)

    def test_staggered_wave(self):
        got = self._run(packed=True, stagger=True)
        want = self._run(packed=False, stagger=True)
        assert got == want, (got, want)


class TestSpeculativePackedPrefill:
    """Spec engine admission wave: packed target AND draft prefills must
    reproduce the per-request path exactly (greedy outputs + stats)."""

    def _run(self, packed, paged=False):
        from composable_kernel_tpu.runtime.serving import (
            SpeculativeServingEngine,
        )

        draft = llama.init_weights(CFG, jax.random.PRNGKey(99))
        eng = SpeculativeServingEngine(
            PARAMS, CFG, draft, CFG, kernels=True, interpret=True,
            batch_slots=3, spec_chunk=3, paged=paged,
            packed_prefill=packed, pack_block=128,
        )
        reqs = [
            Request(0, [5, 9, 2, 14], max_new_tokens=5),
            Request(1, list(range(1, 40)), max_new_tokens=4),
            Request(2, [7, 5], max_new_tokens=5),
        ]
        for r in reqs:
            eng.add(r)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
            assert steps < 60
        if packed:
            assert eng.prefill_stats["packed_waves"] >= 1, eng.prefill_stats
        else:
            assert eng.prefill_stats["packed_waves"] == 0, eng.prefill_stats
        return [r.output for r in reqs], dict(eng.stats)

    @pytest.mark.parametrize("paged", [False, True])
    def test_matches_per_request(self, paged):
        got, gstats = self._run(packed=True, paged=paged)
        want, wstats = self._run(packed=False, paged=paged)
        assert got == want, (got, want)
        assert gstats == wstats, (gstats, wstats)


class TestPackedChunkWave:
    """Packed ragged chunk rounds (_chunked_prefill_wave, c % 128 == 0):
    a mixed-length wave pays sum(ceil(len/c)) chunk rows; outputs must
    match isolated greedy decoding."""

    def test_matches_isolated_greedy(self):
        prompts = [
            list(np.asarray(jax.random.randint(
                jax.random.PRNGKey(60 + i), (n,), 0, CFG.vocab_size)))
            for i, n in enumerate((200, 140, 96))
        ]
        eng = ServingEngine(PARAMS, CFG, batch_slots=3, kernels=True,
                            interpret=True, prefill_chunk=128)
        reqs = [Request(i, p, max_new_tokens=3) for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add(r)
        steps = 0
        while eng.pending():
            eng.step()
            steps += 1
            assert steps < 40
        # path-fired gate: the packed ragged chunk rounds must have run
        assert eng.prefill_stats["chunk_waves"] == 1, eng.prefill_stats
        for i, (r, p) in enumerate(zip(reqs, prompts)):
            want = _isolated_greedy(p, 3)
            assert r.output == want, (i, r.output, want)

    def test_compile_bucket_reuse(self):
        # two waves with different live-set sizes share the (e_n, calib)
        # jit cache entries; the cache stays power-of-two sized
        prompts = [
            list(np.asarray(jax.random.randint(
                jax.random.PRNGKey(70 + i), (n,), 0, CFG.vocab_size)))
            for i, n in enumerate((140, 130, 96, 40))
        ]
        eng = ServingEngine(PARAMS, CFG, batch_slots=4, kernels=True,
                            interpret=True, prefill_chunk=128)
        reqs = [Request(i, p, max_new_tokens=2) for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add(r)
        while eng.pending():
            eng.step()
        keys = set(eng._chunk_packed_cache)
        assert keys <= {(1, False), (2, False), (4, True), (4, False),
                        (2, True), (1, True)}, keys
        for r, p in zip(reqs, prompts):
            assert r.output == _isolated_greedy(p, 2), r.id
