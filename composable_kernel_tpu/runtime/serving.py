"""Continuous-batching serving engine.

The multi-request serving layer the north star requires (SURVEY.md §2.6,
§5 — entirely absent in the single-GPU reference; its closest kernel-level
relative is the grouped-GEMM tile-loop whose device-side args let work
arrive without host resizing, device_grouped_gemm_tile_loop.hpp:26-95).

Design (TPU-shaped):
  - a FIXED batch of B slots — XLA needs static shapes, so admission
    control fills/clears slots inside a constant-shape decode step instead
    of re-batching (the continuous-batching invariant);
  - per-slot positions + kv_seq_len masks (models.llama.decode_step_batched);
  - prefill runs per-request and scatters its KV into the slot;
  - a watchdog wrapper supplies the failure-detection/restart hook the
    serving layer owes (reference has none to port — §5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.models.sampling import sample_logits

__all__ = ["Request", "ServingEngine", "Watchdog"]


@dataclass
class Request:
    uid: int
    prompt: list
    max_new_tokens: int = 32
    eos_id: int | None = None
    # sampling (defaults = greedy): temperature 0 -> argmax; top_k 0 /
    # top_p 1.0 -> no cut (models.sampling.sample_logits semantics)
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    # filled by the engine:
    output: list = field(default_factory=list)
    done: bool = False


class ServingEngine:
    """Fixed-slot continuous batching over a single (possibly sharded) model.

    Usage::

        eng = ServingEngine(params, cfg, batch_slots=8)
        eng.add(Request(0, prompt_tokens, max_new_tokens=64))
        while eng.pending():
            finished = eng.step()
    """

    def __init__(self, params, cfg: llama.LlamaConfig, batch_slots: int = 8,
                 kernels: bool = True, interpret=None,
                 prefill_chunk: int | None = None,
                 paged: bool = False, n_pages: int | None = None,
                 page_size: int = 128, seed: int = 0,
                 packed_prefill: bool | None = None,
                 pack_block: int = 512):
        if kernels and cfg.quant in ("w4a16", "int8", "w4a8", "w8a8"):
            # load-time weight prep: pad + scale-expand leaves whose decode
            # N block cannot divide N (vocab-sized lm_head) ONCE, instead
            # of per decode step (llama.prepare_params docstring)
            params = llama.prepare_params(params, cfg)
        self.params = params
        self.cfg = cfg
        self.b = batch_slots
        self.kernels = kernels
        self.interpret = interpret
        # chunked prefill: prompts longer than this stream through
        # fixed-size chunk steps (models.llama.prefill_chunk_step) instead
        # of one monolithic forward — bounds prefill latency spikes
        self.prefill_chunk = prefill_chunk
        self.paged = paged
        # packed-varlen (group-mode) prefill: when >=2 requests admit in the
        # same scheduling pass, pack their prompts block-aligned and run ONE
        # forward_varlen over the mixed batch — sum(ceil(len/block)) rows
        # instead of one padded/per-length-compiled forward each (ck_tile
        # group mode, fmha_fwd_kernel.hpp:505-555). Total packed rows are
        # bucketed to power-of-two block multiples to bound compile count.
        if packed_prefill is None:
            packed_prefill = kernels and prefill_chunk is None
        self.packed_prefill = packed_prefill
        self.pack_block = pack_block
        self._packed_fwd_cache = None
        self.positions = np.zeros(batch_slots, np.int32)  # next decode pos
        self.slot_req: list[Request | None] = [None] * batch_slots
        self.next_token = np.zeros((batch_slots, 1), np.int32)
        self.queue: list[Request] = []
        # per-slot sampling params (greedy defaults); one compiled step
        # serves heterogeneous requests
        self.temperature = np.zeros(batch_slots, np.float32)
        self.top_k = np.zeros(batch_slots, np.int32)
        self.top_p = np.ones(batch_slots, np.float32)
        self._key = jax.random.PRNGKey(seed)
        self._step_i = 0
        # requests that completed during prefill (eos on first token or
        # max_new_tokens<=1) — surfaced in the next step()'s finished list
        # so callers collecting completions from step() never miss them
        self._prefill_finished: list[Request] = []
        # path-fired accounting: parity tests and the serving bench assert
        # the fast path actually executed (the round-4 admission bug class:
        # a parity test that silently compares a path against itself)
        self.prefill_stats = {"packed_waves": 0, "chunk_waves": 0,
                              "per_request": 0, "wave_entries": 0}
        # decode-side twin of prefill_stats: which decode path ran, and
        # whether the paged engine really allocated pool pages
        self.decode_stats = {"paged_steps": 0, "dense_steps": 0,
                             "pages_allocated": 0}
        # last prefill logits per request uid (device arrays) — the
        # serving bench / parity harnesses compare these against the
        # monolithic forward (profile_gemm_impl.hpp:140-195 discipline:
        # verify the exact path you are about to time)
        self.last_prefill_logits = {}
        if paged:
            # paged KV: the cache is a global page pool, sized by expected
            # concurrent tokens rather than slots x max_seq. A request is
            # admitted only when its full prompt+generation page span is
            # free (so decode never stalls on pool exhaustion mid-flight).
            self.page = page_size
            max_pages_per_seq = -(-cfg.max_seq_len // page_size)
            if n_pages is None:
                n_pages = 1 + batch_slots * max_pages_per_seq
            self.pools = llama.init_paged_cache(cfg, n_pages, page_size,
                                                batch_slots=batch_slots)
            self.free_pages = list(range(n_pages - 1, 0, -1))  # 0 = null
            self.table = np.zeros((batch_slots, max_pages_per_seq), np.int32)
            self.slot_pages: list[list[int]] = [[] for _ in range(batch_slots)]
            def _paged_step(p, pools, tab, t, pos, temp, tk, tp, key):
                logits, pools = llama.paged_decode_step(
                    p, pools, tab, t, pos, cfg, page=page_size,
                    kernels=kernels, interpret=interpret,
                )
                ids = sample_logits(logits[:, -1], key, temperature=temp,
                                    top_k=tk, top_p=tp)
                return ids, pools

            self._decode = jax.jit(_paged_step, donate_argnums=(1,))
        else:
            self.cache = llama.init_kv_cache(cfg, batch_slots)
            # donate the cache: decode updates it in place in HBM instead of
            # copying ~0.5 GB of KV per step
            def _slot_step(p, c, t, pos, temp, tk, tp, key):
                logits, c = llama.decode_step_batched(
                    p, c, t, pos, cfg, kernels=kernels, interpret=interpret
                )
                ids = sample_logits(logits[:, -1], key, temperature=temp,
                                    top_k=tk, top_p=tp)
                return ids, c

            self._decode = jax.jit(_slot_step, donate_argnums=(1,))

    def reset(self):
        """Clear all request/slot state, keeping compiled functions and
        allocated caches (stale KV rows are dead: positions mask them).
        Lets a benchmark or a server drain-and-restart without paying the
        per-engine jit retrace."""
        self.positions[:] = 0
        self.slot_req = [None] * self.b
        self.next_token[:] = 0
        self.queue = []
        self.temperature[:] = 0.0
        self.top_k[:] = 0
        self.top_p[:] = 1.0
        self._step_i = 0
        self._prefill_finished = []
        self.prefill_stats = {"packed_waves": 0, "chunk_waves": 0,
                              "per_request": 0, "wave_entries": 0}
        self.decode_stats = {"paged_steps": 0, "dense_steps": 0,
                             "pages_allocated": 0}
        self.last_prefill_logits = {}
        if self.paged:
            for slot in range(self.b):
                self._free_slot_pages(slot)

    # ------------------------------------------------------------ admission
    def add(self, req: Request):
        """Queue a request (validated eagerly so bad requests fail at the
        call site). Admission is deferred to the next ``step()`` boundary —
        or an explicit :meth:`admit` — so requests added between steps
        admit TOGETHER and take the wave prefill paths (packed-varlen /
        packed chunk rounds); the previous synchronous per-add admission
        always formed 1-request waves and silently bypassed them."""
        self._validate_prefill(req)
        self.queue.append(req)

    def admit(self):
        """Admit queued requests now (otherwise the next step() does)."""
        self._admit()

    def _pages_needed(self, req: Request) -> int:
        """Pages a request reserves for its whole lifetime (subclasses add
        slack, e.g. speculative chunk rows)."""
        return -(-(len(req.prompt) + req.max_new_tokens) // self.page)

    def _admit(self):
        # admission loops until no slot can take the head-of-line request;
        # each pass collects every admissible (slot, request) pair so the
        # packed-varlen path can prefill the whole wave in ONE forward
        while self.queue:
            pairs = []
            taken = set()
            reserved = 0  # pages claimed by earlier pairs in this wave
            for slot in range(self.b):
                if not self.queue:
                    break
                if self.slot_req[slot] is not None or slot in taken:
                    continue
                if self.paged:
                    need = self._pages_needed(self.queue[0])
                    if len(self.free_pages) - reserved < need:
                        break  # pool full: head-of-line waits for frees
                    reserved += need
                pairs.append((slot, self.queue.pop(0)))
                taken.add(slot)
            if not pairs:
                return
            if self.packed_prefill and len(pairs) >= 2:
                self.prefill_stats["packed_waves"] += 1
                self.prefill_stats["wave_entries"] += len(pairs)
                self._prefill_packed(pairs)
            elif (self.prefill_chunk and len(pairs) >= 2 and not self.paged
                  and max(len(r.prompt) for _, r in pairs)
                  > self.prefill_chunk):
                self.prefill_stats["chunk_waves"] += 1
                self.prefill_stats["wave_entries"] += len(pairs)
                self._chunked_prefill_wave(pairs)
            else:
                for slot, req in pairs:
                    self.prefill_stats["per_request"] += 1
                    self._prefill_into(slot, req)
            # requests that finished AT prefill freed their slots: loop and
            # admit into them (mirrors the old per-slot retry)

    def _prefill_into(self, slot: int, req: Request):
        self._validate_prefill(req)
        prompt = jnp.asarray([req.prompt], jnp.int32)
        s = prompt.shape[1]
        if self.paged:
            # reserve the full prompt+generation span up front (admission
            # checked availability) so decode never stalls mid-flight
            need = self._pages_needed(req)
            pages = [self.free_pages.pop() for _ in range(need)]
            self.decode_stats["pages_allocated"] += len(pages)
            self.slot_pages[slot] = pages
            self.table[slot, : len(pages)] = pages
            logits, seeds = llama.forward(
                self.params, prompt, self.cfg, kernels=self.kernels,
                interpret=self.interpret, return_cache=True,
            )
            self.pools = llama.seed_paged_cache(
                self.pools, seeds, self.table, self.cfg, page=self.page,
                slot_pages=pages, slot=slot,
            )
        elif self.prefill_chunk and s > self.prefill_chunk:
            logits = self._chunked_prefill(slot, prompt)
        else:
            logits, seeds = llama.forward(
                self.params, prompt, self.cfg, kernels=self.kernels,
                interpret=self.interpret, return_cache=True,
            )
            self.cache = llama.seed_kv_cache(
                self.cache, seeds, self.cfg, slot=slot
            )
        self._finish_prefill(slot, req, logits[0, -1])

    def _finish_prefill(self, slot: int, req: Request, last_logits,
                        greedy_tok=None):
        """Sample/argmax the prefill-produced token and wire the slot (or
        retire the request if that token already finishes it).
        ``greedy_tok``: precomputed argmax (wave paths batch all slots'
        argmaxes into one readback instead of one ~50 ms tunnel round trip
        per request)."""
        self.last_prefill_logits[req.uid] = last_logits
        if req.temperature > 0.0:
            self._step_i += 1
            key = jax.random.fold_in(self._key, self._step_i)
            nxt = int(sample_logits(
                last_logits[None], key,
                temperature=jnp.asarray([req.temperature], jnp.float32),
                top_k=jnp.asarray([req.top_k], jnp.int32),
                top_p=jnp.asarray([req.top_p], jnp.float32),
            )[0])
        elif greedy_tok is not None:
            nxt = int(greedy_tok)
        else:
            nxt = int(jnp.argmax(last_logits))
        req.output.append(nxt)
        # the prefill-produced token can already finish the request
        if (req.eos_id is not None and nxt == req.eos_id) or (
            req.max_new_tokens <= 1
        ):
            req.done = True
            self._prefill_finished.append(req)
            if self.paged:
                self._free_slot_pages(slot)
            return
        self.slot_req[slot] = req
        self.positions[slot] = len(req.prompt)
        self.next_token[slot, 0] = nxt
        self.temperature[slot] = req.temperature
        self.top_k[slot] = req.top_k
        self.top_p[slot] = req.top_p

    def _validate_prefill(self, req: Request):
        if len(req.prompt) + req.max_new_tokens > self.cfg.max_seq_len:
            raise ValueError(
                f"request {req.uid}: prompt ({len(req.prompt)}) + "
                f"max_new_tokens ({req.max_new_tokens}) exceeds "
                f"max_seq_len ({self.cfg.max_seq_len})"
            )

    def _packed_forward(self, pairs, params, cfg, tag: str):
        """One jitted ``forward_varlen`` over the packed prompts of a wave.

        Total rows bucket to power-of-two multiples of ``pack_block`` and
        the sequence tables pad to batch_slots entries (dummy rows start
        past the end with len 0), so each (tag, t_pad) compiles once.
        Returns (logits [B, V], packed per-layer seeds, starts).
        """
        from composable_kernel_tpu.ops.attention import pack_varlen

        blk = self.pack_block
        prompts = [jnp.asarray(req.prompt, jnp.int32) for _, req in pairs]
        toks, starts, lens = pack_varlen(prompts, blk)
        t = toks.shape[0]
        t_pad = blk * (1 << max(0, (t - 1) // blk).bit_length())
        toks = jnp.pad(toks, (0, t_pad - t))
        nb = self.b
        starts_p = np.full(nb, t_pad, np.int32)
        lens_p = np.zeros(nb, np.int32)
        starts_p[: len(pairs)] = np.asarray(starts)
        lens_p[: len(pairs)] = np.asarray(lens)

        if self._packed_fwd_cache is None:
            self._packed_fwd_cache = {}
        if tag not in self._packed_fwd_cache:
            kernels, interpret = self.kernels, self.interpret
            bq = min(512, blk)

            def _packed(p, tk, st, ln):
                return llama.forward_varlen(
                    p, tk, st, ln, cfg, block=blk, block_q=bq, block_k=blk,
                    kernels=kernels, interpret=interpret, return_cache=True,
                )

            self._packed_fwd_cache[tag] = jax.jit(_packed)
        logits, seeds = self._packed_fwd_cache[tag](
            params, toks, jnp.asarray(starts_p), jnp.asarray(lens_p)
        )
        return logits, seeds, starts

    @staticmethod
    def _slot_seeds(seeds, s0: int, li: int):
        """Slice one sequence's packed [T, Hkv, hd] seeds to the
        [1, Hkv, S, hd] layout seed_kv_cache/seed_paged_cache take."""
        return [
            (kp[s0 : s0 + li].transpose(1, 0, 2)[None],
             vp[s0 : s0 + li].transpose(1, 0, 2)[None])
            for kp, vp in seeds
        ]

    def _prefill_packed(self, pairs):
        """ONE group-mode forward over every admissible request: prompts
        pack block-aligned (``ops.attention.pack_varlen``), the model runs
        ``llama.forward_varlen``, and each slot seeds its cache from its
        packed row range."""
        for _, req in pairs:
            self._validate_prefill(req)
        logits, seeds, starts = self._packed_forward(
            pairs, self.params, self.cfg, "target"
        )

        for i, (slot, req) in enumerate(pairs):
            slot_seeds = self._slot_seeds(seeds, int(starts[i]),
                                          len(req.prompt))
            if self.paged:
                need = self._pages_needed(req)
                pages = [self.free_pages.pop() for _ in range(need)]
                self.decode_stats["pages_allocated"] += len(pages)
                self.slot_pages[slot] = pages
                self.table[slot, : len(pages)] = pages
                self.pools = llama.seed_paged_cache(
                    self.pools, slot_seeds, self.table, self.cfg,
                    page=self.page, slot_pages=pages, slot=slot,
                )
            else:
                self.cache = llama.seed_kv_cache(
                    self.cache, slot_seeds, self.cfg, slot=slot
                )
            self._finish_prefill(slot, req, logits[i])

    def _scatter_wave_cache(self, tmp, slots):
        """Scatter wave-slot cache rows into engine cache slots in ONE
        jitted, cache-donating call. The loop of per-(layer, leaf, slot)
        eager ``dynamic_update_slice`` ops it replaces dispatched hundreds
        of full-cache functional copies through the tunnel (each eager op
        copies the whole [B, H, S, D] leaf): measured 1.4-1.9 s of the
        mixed-wave TTFT at 8B — more than the wave's compute."""
        n = len(slots)
        if not hasattr(self, "_scatter_jit"):
            self._scatter_jit = {}
        fn = self._scatter_jit.get(n)
        if fn is None:
            def _scat(cache, tmp_, slot_arr):
                out = []
                for eng, t in zip(cache, tmp_):
                    e = dict(eng)
                    for key in ("k", "v", "ks", "vs"):
                        if key in e:
                            e[key] = e[key].at[slot_arr].set(
                                t[key][: slot_arr.shape[0]]
                            )
                    out.append(e)
                return out
            fn = jax.jit(_scat, donate_argnums=(0,))
            self._scatter_jit[n] = fn
        self.cache = fn(self.cache, tmp, jnp.asarray(slots, jnp.int32))

    def _chunked_prefill(self, slot: int, prompt):
        """Stream the prompt through chunk steps on a temp 1-slot cache,
        then scatter the rows (and scales) into the engine cache slot."""
        c = self.prefill_chunk
        s = prompt.shape[1]
        tmp = llama.init_kv_cache(self.cfg, 1)
        logits = None
        pos = 0
        while pos < s:
            chunk = prompt[:, pos : pos + c]
            if chunk.shape[1] < c and pos > 0:
                pass  # ragged tail chunk: fine, shapes are per-call static
            logits, tmp = llama.prefill_chunk_step(
                self.params, tmp, chunk, pos, self.cfg,
                kernels=self.kernels, interpret=self.interpret,
                calibrate_scales=(pos == 0),
            )
            pos += chunk.shape[1]
        self._scatter_wave_cache(tmp, [slot])
        return logits

    def _chunked_prefill_wave(self, pairs):
        """Chunked prefill of a whole admission wave in lockstep.

        Default (``c % 128 == 0``): PACKED ragged rounds — each round runs
        one ``prefill_chunk_step_packed`` over only the LIVE entries
        (prompts still inside their length), bucketed to a power-of-two
        entry count for compile reuse. A mixed-length wave pays
        ``sum(ceil(len_i/c))`` chunk rows instead of the padded wave's
        ``B_wave * ceil(max_len/c)`` — the chunk-path analog of the
        packed-varlen admission wave (`_prefill_packed`), composing CK's
        group mode with chunked prefill.

        Fallback (chunk size not 128-aligned, or a cache length the
        varlen-cache kernel cannot tile): the padded lockstep wave — one
        batched ``prefill_chunk_step`` over all wave slots per round;
        shorter prompts step on padding tokens whose rows are garbage but
        never read (decode masks attend kv_seq_len = live length).
        """
        from composable_kernel_tpu.models import llama

        c = self.prefill_chunk
        bw = self.b  # fixed wave width
        assert len(pairs) <= bw
        for _, req in pairs:
            self._validate_prefill(req)
        lens = [len(req.prompt) for _, req in pairs]
        n_rounds = -(-max(lens) // c)
        import numpy as np

        packed_ok = (
            self.kernels
            and c % 128 == 0
            and self.cfg.max_seq_len % 128 == 0
        )
        tmp = llama.init_kv_cache(self.cfg, bw)
        last_logits = [None] * len(pairs)

        if packed_ok:
            if not hasattr(self, "_chunk_packed_cache"):
                self._chunk_packed_cache = {}

            def _get_fn(e_n, calib):
                key = (e_n, calib)
                if key not in self._chunk_packed_cache:
                    def _round(p, cache, toks, lens_, slots, pos, _c=calib):
                        return llama.prefill_chunk_step_packed(
                            p, cache, toks, lens_, slots, pos, self.cfg,
                            kernels=self.kernels, interpret=self.interpret,
                            calibrate_scales=_c,
                        )

                    self._chunk_packed_cache[key] = jax.jit(_round)
                return self._chunk_packed_cache[key]

            for j in range(n_rounds):
                live = [i for i, l in enumerate(lens) if l > j * c]
                e_n = 1
                while e_n < len(live):
                    e_n *= 2  # bucket: compiles bounded by log2(bw)+1
                e_n = min(e_n, bw)
                toks = np.zeros((e_n, c), np.int32)
                lens_r = np.zeros((e_n,), np.int32)
                # Dead pad entries must target a wave slot that is NOT
                # live this round: a pad aliasing a live slot gives two
                # grid steps a read-modify-write of the same aliased cache
                # slab, which on real TPU can re-fetch the stale
                # double-buffered input and revert the live entry's write
                # (the kv_cache_append_chunk "written exactly once"
                # invariant). One always exists when padding exists
                # (len(live) < e_n <= bw); several pads sharing it is fine
                # — identity rewrites are idempotent.
                if len(live) < e_n:
                    dead = next(s for s in range(bw) if s not in set(live))
                else:
                    dead = 0  # no pads; value unused
                slots = np.full((e_n,), dead, np.int32)
                for e, i in enumerate(live):
                    li = min(c, lens[i] - j * c)
                    toks[e, :li] = pairs[i][1].prompt[j * c : j * c + li]
                    lens_r[e] = li
                    slots[e] = i  # live entry -> its own wave slot
                pos = np.full((e_n,), j * c, np.int32)
                logits, tmp = _get_fn(e_n, j == 0)(
                    self.params, tmp, jnp.asarray(toks), jnp.asarray(lens_r),
                    jnp.asarray(slots), jnp.asarray(pos),
                )
                for e, i in enumerate(live):
                    if (lens[i] - 1) // c == j:
                        last_logits[i] = logits[e]
        else:
            toks = np.zeros((bw, n_rounds * c), np.int32)
            for i, (_, req) in enumerate(pairs):
                toks[i, : len(req.prompt)] = req.prompt
            toks = jnp.asarray(toks)

            if not hasattr(self, "_chunk_wave_cache"):
                self._chunk_wave_cache = None
            if self._chunk_wave_cache is None:
                def _round(p, cache, chunk, pos, calibrate):
                    return llama.prefill_chunk_step(
                        p, cache, chunk, pos, self.cfg, kernels=self.kernels,
                        interpret=self.interpret, calibrate_scales=calibrate,
                    )

                self._chunk_wave_cache = {
                    calib: jax.jit(lambda p, cch, ch, po, _c=calib: _round(
                        p, cch, ch, po, _c))
                    for calib in (False, True)
                }

            for j in range(n_rounds):
                chunk = jax.lax.dynamic_slice_in_dim(toks, j * c, c, 1)
                # pos as a traced scalar: one compile per calib flag
                logits, tmp = self._chunk_wave_cache[j == 0](
                    self.params, tmp, chunk, jnp.int32(j * c)
                )
                for i, l in enumerate(lens):
                    if (l - 1) // c == j:
                        last_logits[i] = logits[i, (l - 1) % c]

        # scatter every wave slot's rows + scales into the engine cache
        # slots in one jitted donation (see _scatter_wave_cache)
        self._scatter_wave_cache(tmp, [slot for slot, _ in pairs])
        toks = None
        if all(req.temperature == 0.0 for _, req in pairs):
            # one batched argmax readback for the whole wave
            toks = np.asarray(jnp.stack(
                [jnp.argmax(l) for l in last_logits]))
        for i, (slot, req) in enumerate(pairs):
            self._finish_prefill(
                slot, req, last_logits[i],
                greedy_tok=None if toks is None else toks[i],
            )

    # --------------------------------------------------------------- decode
    def pending(self) -> int:
        return len(self.queue) + sum(r is not None for r in self.slot_req)

    def active_slots(self):
        return [i for i, r in enumerate(self.slot_req) if r is not None]

    def step(self):
        """One fixed-shape decode step for every active slot.

        Returns the list of requests finished this step.
        """
        self._admit()  # deferred admission: everything queued since the
        # last step admits as one wave (see add())
        finished_at_prefill, self._prefill_finished = self._prefill_finished, []
        if not self.active_slots():
            return finished_at_prefill
        self._step_i += 1
        key = jax.random.fold_in(self._key, self._step_i)
        samp = (jnp.asarray(self.temperature), jnp.asarray(self.top_k),
                jnp.asarray(self.top_p), key)
        if self.paged:
            self.decode_stats["paged_steps"] += 1
            ids, self.pools = self._decode(
                self.params, self.pools, jnp.asarray(self.table),
                jnp.asarray(self.next_token), jnp.asarray(self.positions),
                *samp,
            )
        else:
            self.decode_stats["dense_steps"] += 1
            ids, self.cache = self._decode(
                self.params, self.cache,
                jnp.asarray(self.next_token), jnp.asarray(self.positions),
                *samp,
            )
        next_ids = np.asarray(ids, np.int32)

        finished = finished_at_prefill
        for slot in self.active_slots():
            req = self.slot_req[slot]
            tok = int(next_ids[slot])
            req.output.append(tok)
            self.positions[slot] += 1
            self.next_token[slot, 0] = tok
            hit_eos = req.eos_id is not None and tok == req.eos_id
            out_of_room = self.positions[slot] + 1 >= self.cfg.max_seq_len
            if len(req.output) >= req.max_new_tokens or hit_eos or out_of_room:
                req.done = True
                finished.append(req)
                self.slot_req[slot] = None
                self.positions[slot] = 0
                self.temperature[slot] = 0.0
                self.top_k[slot] = 0
                self.top_p[slot] = 1.0
                if self.paged:
                    self._free_slot_pages(slot)
        self._admit()
        return finished

    def _free_slot_pages(self, slot: int):
        self.free_pages.extend(reversed(self.slot_pages[slot]))
        self.slot_pages[slot] = []
        self.table[slot, :] = 0


class SpeculativeServingEngine(ServingEngine):
    """Continuous batching with draft-verify speculative decoding.

    Every active slot drafts ``spec_chunk - 1`` greedy tokens with the
    small draft model (one [B, 1] batched decode step per proposal) and the
    target verifies the whole chunk in ONE [B, K] chunk step per round
    (``prefill_chunk_step``'s per-slot offset mode). Slots commit 1..K
    tokens per round independently; outputs are EXACTLY what target-only
    greedy decoding would produce (greedy acceptance), so only greedy
    requests (temperature == 0) are accepted.

    Cache discipline matches runtime.speculative: rejected rows stay in
    place masked by kv_seq_len; freed slots are re-prefilled over their
    stale rows. Inactive slots ride the fixed-shape batch with frozen
    positions. Admission reserves ``spec_chunk`` rows of slack past
    prompt + max_new_tokens.

    ``paged=True`` composes with the page-pool cache: the verify step is
    ``llama.paged_prefill_chunk_step`` (chunk scatter + in-chunk-causal
    paged attention); the draft keeps a contiguous cache (a draft model's
    KV is small — paging it buys nothing). Page reservations include the
    ``spec_chunk`` slack rows.

    Sampled requests (temperature > 0) take the fallback path: their
    slots ride the same fixed-shape rounds but commit exactly ONE token
    per round, sampled from the verify step's first-position logits —
    draft proposals for those slots are dead weight, never accepted, so
    sampling stays exact w.r.t. the target distribution. Mixed batches
    work; throughput gains apply to the greedy slots only.

    Beyond the reference's scope (CK has no serving layer); the serving
    analog of the fixed-NK grouped-GEMM "one launch, many problems" idea.
    """

    def __init__(self, params, cfg: llama.LlamaConfig, draft_params,
                 draft_cfg: llama.LlamaConfig, *, spec_chunk: int = 4,
                 batch_slots: int = 8, kernels: bool = True, interpret=None,
                 paged: bool = False, n_pages: int | None = None,
                 page_size: int = 128, seed: int = 0,
                 packed_prefill: bool | None = None, pack_block: int = 512):
        self.k = spec_chunk  # _pages_needed runs during super().__init__-admits
        super().__init__(params, cfg, batch_slots, kernels, interpret,
                         paged=paged, n_pages=n_pages, page_size=page_size,
                         seed=seed, packed_prefill=packed_prefill,
                         pack_block=pack_block)
        assert cfg.vocab_size == draft_cfg.vocab_size
        self.dparams = draft_params
        self.dcfg = draft_cfg
        self.dcache = llama.init_kv_cache(draft_cfg, batch_slots)
        self.stats = {"rounds": 0, "draft_steps": 0, "accepted": 0,
                      "committed": 0}

        def _draft(p, c, t, pos):
            return llama.decode_step_batched(
                p, c, t, pos, draft_cfg, kernels=kernels, interpret=interpret
            )

        self._draft = jax.jit(_draft, donate_argnums=(1,))
        if paged:
            def _verify(p, pools, tab, t, pos):
                return llama.paged_prefill_chunk_step(
                    p, pools, tab, t, pos, cfg, page=page_size,
                    kernels=kernels, interpret=interpret,
                )

            self._verify = jax.jit(_verify, donate_argnums=(1,))
        else:
            def _verify(p, c, t, pos):
                return llama.prefill_chunk_step(
                    p, c, t, pos, cfg, kernels=kernels, interpret=interpret
                )

            self._verify = jax.jit(_verify, donate_argnums=(1,))

    def _pages_needed(self, req: Request) -> int:
        # spec_chunk slack: the verify step writes K rows past the last
        # committed position, so the page span must cover them
        return -(-(len(req.prompt) + req.max_new_tokens + self.k) // self.page)

    def _validate_prefill(self, req: Request):
        if len(req.prompt) + req.max_new_tokens + self.k > self.cfg.max_seq_len:
            raise ValueError(
                f"request {req.uid}: prompt + max_new_tokens + spec_chunk "
                f"({len(req.prompt)} + {req.max_new_tokens} + {self.k}) "
                f"exceeds max_seq_len ({self.cfg.max_seq_len})"
            )

    def _prefill_into(self, slot: int, req: Request):
        super()._prefill_into(slot, req)
        if self.slot_req[slot] is not req:
            return  # finished at prefill: no draft state needed
        # seed the draft cache for this slot (the draft shares the prompt)
        prompt = jnp.asarray([req.prompt], jnp.int32)
        _, seeds = llama.forward(
            self.dparams, prompt, self.dcfg, kernels=self.kernels,
            interpret=self.interpret, return_cache=True,
        )
        self.dcache = llama.seed_kv_cache(
            self.dcache, seeds, self.dcfg, slot=slot
        )

    def _prefill_packed(self, pairs):
        """Packed wave for the speculative engine: the target side rides
        the base implementation, then ONE more packed forward with the
        DRAFT model seeds the draft caches (slots whose request finished
        at prefill need no draft state)."""
        super()._prefill_packed(pairs)
        live = [(i, slot, req) for i, (slot, req) in enumerate(pairs)
                if self.slot_req[slot] is req]
        if not live:
            return
        _, dseeds, starts = self._packed_forward(
            pairs, self.dparams, self.dcfg, "draft"
        )
        for i, slot, req in live:
            slot_seeds = self._slot_seeds(dseeds, int(starts[i]),
                                          len(req.prompt))
            self.dcache = llama.seed_kv_cache(
                self.dcache, slot_seeds, self.dcfg, slot=slot
            )

    def step(self):
        """One speculative round: up to ``spec_chunk`` tokens per slot."""
        self._admit()  # deferred admission (see ServingEngine.add)
        finished, self._prefill_finished = self._prefill_finished, []
        active = self.active_slots()
        if not active:
            return finished
        k = self.k
        pos0 = self.positions.copy()

        props = [[] for _ in range(self.b)]
        tok = self.next_token.copy()  # [B, 1]
        for i in range(k - 1):
            lg, self.dcache = self._draft(
                self.dparams, self.dcache, jnp.asarray(tok),
                jnp.asarray(pos0 + i, jnp.int32),
            )
            t = np.asarray(jnp.argmax(lg[:, -1], axis=-1), np.int32)
            for b in range(self.b):
                props[b].append(int(t[b]))
            tok = t[:, None]
            self.stats["draft_steps"] += 1

        chunk = np.concatenate(
            [self.next_token, np.asarray(props, np.int32)], axis=1
        )  # [B, k]
        if self.paged:
            lg_t, self.pools = self._verify(
                self.params, self.pools, jnp.asarray(self.table),
                jnp.asarray(chunk), jnp.asarray(pos0, jnp.int32),
            )
        else:
            lg_t, self.cache = self._verify(
                self.params, self.cache, jnp.asarray(chunk),
                jnp.asarray(pos0, jnp.int32),
            )
        targets = np.asarray(jnp.argmax(lg_t, axis=-1), np.int32)  # [B, k]
        self.stats["rounds"] += 1
        if any(self.temperature[s] > 0.0 for s in active):
            # sampled-slot fallback tokens: one draw from the verify step's
            # first-position logits (the distribution after next_token)
            self._step_i += 1
            key = jax.random.fold_in(self._key, self._step_i)
            sampled = np.asarray(sample_logits(
                lg_t[:, 0], key,
                temperature=jnp.asarray(self.temperature),
                top_k=jnp.asarray(self.top_k),
                top_p=jnp.asarray(self.top_p),
            ), np.int32)
        else:
            sampled = None

        full = np.zeros(self.b, bool)
        for slot in active:
            req = self.slot_req[slot]
            if self.temperature[slot] > 0.0:
                # fallback: commit exactly one sampled token; proposal rows
                # stay masked/overwritten (never accepted)
                n_acc = 0
                new_toks = [int(sampled[slot])]
            else:
                n_acc = 0
                while (n_acc < k - 1
                       and props[slot][n_acc] == targets[slot][n_acc]):
                    n_acc += 1
                full[slot] = n_acc == k - 1
                # newly produced tokens: accepted proposals + corrected/bonus
                new_toks = props[slot][:n_acc] + [int(targets[slot][n_acc])]
            self.stats["accepted"] += n_acc
            self.positions[slot] += n_acc + 1  # committed into the cache
            self.stats["committed"] += n_acc + 1
            done = False
            for t in new_toks:
                req.output.append(t)
                self.next_token[slot, 0] = t
                if (
                    (req.eos_id is not None and t == req.eos_id)
                    or len(req.output) >= req.max_new_tokens
                    or self.positions[slot] + k >= self.cfg.max_seq_len
                ):
                    done = True
                    break
            if done:
                req.done = True
                finished.append(req)
                self.slot_req[slot] = None
                self.positions[slot] = 0
                self.temperature[slot] = 0.0
                self.top_k[slot] = 0
                self.top_p[slot] = 1.0
                full[slot] = False
                if self.paged:
                    self._free_slot_pages(slot)

        if full.any() and k > 1:
            # draft never consumed its own final proposal on fully-accepted
            # slots; fill that row (p-1). Other slots take a masked dummy
            # write at p (overwritten by the next round's first draft step).
            last = np.asarray([pr[-1] for pr in props], np.int32)[:, None]
            _, self.dcache = self._draft(
                self.dparams, self.dcache, jnp.asarray(last),
                jnp.asarray(self.positions - full.astype(np.int32), jnp.int32),
            )

        self._admit()
        return finished


class Watchdog:
    """Failure detection + bounded-retry for device steps (SURVEY.md §5:
    the serving layer must supply health checking the reference lacks).

    Wraps a callable; on exception it re-raises after ``max_retries``
    attempts and tracks step latency for health introspection. A call that
    *succeeds* but exceeds ``timeout_s`` is still a success — retrying it
    would re-execute an already-applied stateful step (double-advancing
    decode) — so it is only counted in ``slow_steps`` and logged.
    """

    def __init__(self, fn, max_retries: int = 2, timeout_s: float | None = None):
        self.fn = fn
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self.failures = 0
        self.slow_steps = 0
        self.last_latency_s: float | None = None

    def __call__(self, *args, **kw):
        last_exc = None
        for _ in range(self.max_retries + 1):
            t0 = time.perf_counter()
            try:
                out = self.fn(*args, **kw)
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001 — health boundary
                self.failures += 1
                last_exc = e
                continue
            self.last_latency_s = time.perf_counter() - t0
            if self.timeout_s and self.last_latency_s > self.timeout_s:
                self.slow_steps += 1
            return out
        raise last_exc

    def healthy(self) -> bool:
        return self.failures == 0
