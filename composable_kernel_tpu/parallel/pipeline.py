"""Pipeline parallelism: GPipe-style microbatching over ppermute.

The 'pp' axis (absent in the single-GPU reference): the layer stack is
divided into contiguous stages, one per device along the 'pp' mesh axis;
microbatches flow through the ring with ``jax.lax.ppermute`` carrying
activations stage-to-stage. (P + M - 1) ticks drain M microbatches; every
device executes identical (uniform) control flow, with stage/validity
predicates selecting real work — the XLA-friendly formulation of a
pipeline schedule.

Embedding, final norm and the LM head are computed replicated (they are
tiny next to the layer stack); the transformer blocks pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from composable_kernel_tpu.models import llama

__all__ = ["make_pp_mesh", "stack_stage_params", "pp_forward", "pp_decode"]


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[:n_stages]), ("pp",))


def stack_stage_params(params, n_stages: int):
    """layers list -> tree of arrays with leading [n_stages, L/stage] dims.

    Layer dicts must be structurally identical (true for the Llama stack).
    Returns (stacked_layers_tree, shared) where shared = embed/norm/head.
    """
    layers = params["layers"]
    assert len(layers) % n_stages == 0, (len(layers), n_stages)
    per = len(layers) // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    # [L, ...] -> [n_stages, per, ...]
    stacked = jax.tree.map(
        lambda x: x.reshape(n_stages, per, *x.shape[1:]), stacked
    )
    shared = {k: v for k, v in params.items() if k != "layers"}
    return stacked, shared


def _block(x, layer, cfg, kernels):
    cos, sin = llama.rope_cos_sin(
        jnp.arange(x.shape[1]), cfg.head_dim, cfg.rope_theta
    )
    h = llama.rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    attn, _ = llama._attn_block(h, layer, cfg, cos, sin, kernels=kernels)
    x = x + attn
    h = llama.rmsnorm(x, layer["ffn_norm"], cfg.norm_eps)
    return x + llama._ffn_block(h, layer, cfg, kernels=kernels)


def pp_forward(
    params,
    tokens,
    cfg,
    mesh: Mesh,
    *,
    n_microbatches: int = 2,
    kernels: bool = False,
):
    """Pipelined prefill: logits [B, S, V] with layers sharded over 'pp'.

    tokens: [B, S] with B divisible by ``n_microbatches``.
    """
    n_stages = mesh.shape["pp"]
    stacked, shared = stack_stage_params(params, n_stages)
    b, s = tokens.shape
    assert b % n_microbatches == 0
    mb = b // n_microbatches

    x = jnp.take(shared["embed"], tokens, axis=0)  # replicated embed
    x_mb = x.reshape(n_microbatches, mb, s, -1)

    def inner(stage_layers, x_mb):
        # stage_layers tree has leading [1, per, ...] — drop the shard dim
        stage_layers = jax.tree.map(lambda v: v[0], stage_layers)
        stage = jax.lax.axis_index("pp")
        n = n_stages

        def apply_stage(h):
            def body(carry, layer):
                return _block(carry, layer, cfg, kernels), None

            h, _ = jax.lax.scan(body, h, stage_layers)
            return h

        buf = jnp.zeros_like(x_mb[0])
        outputs = jnp.zeros_like(x_mb)
        shift = [(i, i + 1) for i in range(n - 1)]
        for t in range(n_microbatches + n - 1):
            feed_idx = jnp.clip(t, 0, n_microbatches - 1)
            feed = x_mb[feed_idx]
            h_in = jnp.where((stage == 0) & (t < n_microbatches), feed, buf)
            h = apply_stage(h_in)
            out_idx = t - (n - 1)
            write = (stage == n - 1) & (out_idx >= 0)
            upd = jax.lax.dynamic_update_slice(
                outputs, h[None], (jnp.maximum(out_idx, 0), 0, 0, 0)
            )
            outputs = jnp.where(write, upd, outputs)
            if t != n_microbatches + n - 2:
                buf = jax.lax.ppermute(h, "pp", shift)
        # only the last stage holds real outputs; psum broadcasts them
        return jax.lax.psum(outputs, "pp")

    stacked_sharded = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1))))
        ),
        stacked,
    )
    layer_specs = jax.tree.map(
        lambda v: P("pp", *([None] * (v.ndim - 1))), stacked
    )
    out = shard_map(
        inner,
        mesh=mesh,
        in_specs=(layer_specs, P()),
        out_specs=P(),
        check_rep=False,
    )(stacked_sharded, x_mb)

    x = out.reshape(b, s, -1)
    x = llama.rmsnorm(x, shared["norm"], cfg.norm_eps)
    logits = llama._linear(
        x.reshape(b * s, -1), shared["lm_head"], cfg, None, kernels
    )
    return logits.reshape(b, s, -1)


def pp_decode(
    params,
    tokens0,
    positions0,
    cfg,
    mesh: Mesh,
    *,
    n_steps: int,
    n_microbatches: int = None,
    kernels: bool = False,
):
    """Token-level pipelined greedy decode over the 'pp' ring.

    The reference has no multi-device execution at all; this is the
    TPU-native decode-side pipeline schedule the GPipe prefill
    (``pp_forward``) lacks: M = P microbatches of requests circulate the
    stage ring so that in steady state every stage decodes a *different*
    microbatch's token each tick — no fill/drain bubble per token, only one
    P-tick fill at the start and drain at the end (T = M*n_steps + P - 1
    ticks total). M must equal P: a microbatch leaving the last stage
    re-enters stage 0 on the next tick, so the circuit period is exactly P
    — M = P is also full utilization (every stage busy every tick).

    Per tick, uniformly on every device: the resident microbatch's hidden
    state is advanced through this stage's layers (stage-local KV caches,
    per-slot positions), the last stage samples greedily and re-embeds, and
    the ring ``ppermute`` hands the activation to the next stage — token
    feedback rides the same rotation that carries activations, so the
    schedule stays a single fori_loop of identical SPMD programs.

    tokens0:    [M, mb_b] int32 — first token to decode per microbatch
                (e.g. the last prompt token from prefill).
    positions0: [M, mb_b] int32 — its position (KV prefix length).
    Returns tokens [M, n_steps, mb_b] (greedy), including the step-0 output.
    """
    n_stages = mesh.shape["pp"]
    stacked, shared = stack_stage_params(params, n_stages)
    m_mb, mb_b = tokens0.shape
    if n_microbatches is None:
        n_microbatches = m_mb
    assert m_mb == n_microbatches
    assert m_mb == n_stages, (
        f"decode ring needs n_microbatches == n_stages, got {m_mb} vs "
        f"{n_stages}: a microbatch re-enters stage 0 one tick after leaving "
        f"the last stage, so the circuit period is exactly the stage count"
    )
    d = cfg.dim

    # stage-local KV caches for every microbatch: [per_layer, M, ...]
    def stage_cache():
        per = len(params["layers"]) // n_stages
        one = llama.init_kv_cache(cfg, mb_b)[:1][0]  # template dict
        return jax.tree.map(
            lambda v: jnp.zeros((per, m_mb) + v.shape, v.dtype), one
        )

    n_ticks = m_mb * n_steps + n_stages - 1
    shift = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def inner(stage_layers, tokens0, positions0):
        stage_layers = jax.tree.map(lambda v: v[0], stage_layers)
        stage = jax.lax.axis_index("pp")
        cache0 = stage_cache()
        pos0 = positions0  # stage-local copy: advances as mbs pass through
        embed = shared["embed"]

        def apply_stage(h, cache_mb, pos_mb):
            cos, sin = llama.rope_cos_sin(pos_mb, cfg.head_dim, cfg.rope_theta)
            cos_b = cos[:, None, None, :]
            sin_b = sin[:, None, None, :]

            def body(carry, inp):
                h = carry
                layer, kv = inp
                h, kv = llama._decode_layer(
                    h, layer, kv, pos_mb, cos_b, sin_b, cfg, kernels=kernels
                )
                return h, kv

            h, cache_mb = jax.lax.scan(body, h, (stage_layers, cache_mb))
            return h, cache_mb

        def tick(t, state):
            buf, cache, pos, out = state
            mb = (t - stage) % m_mb
            # fill phase: stage 0 feeds microbatch t's first token
            first_feed = jnp.take(embed, tokens0[jnp.clip(t, 0, m_mb - 1)], axis=0)
            h_in = jnp.where(
                (stage == 0) & (t < m_mb), first_feed[:, None, :], buf
            )
            cache_mb = jax.tree.map(
                lambda c: jax.lax.dynamic_index_in_dim(c, mb, 1, keepdims=False),
                cache,
            )
            pos_mb = jax.lax.dynamic_index_in_dim(pos, mb, 0, keepdims=False)
            h, cache_mb_new = apply_stage(h_in, cache_mb, pos_mb)

            # last stage: sample greedily, record, re-embed for stage 0
            x = llama.rmsnorm(h, shared["norm"], cfg.norm_eps, kernels=kernels)
            logits = llama._linear(
                x.reshape(mb_b, -1), shared["lm_head"], cfg, None, kernels
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [mb_b]
            h_fed = jnp.take(embed, nxt, axis=0)[:, None, :]
            is_last = stage == n_stages - 1
            h_out = jnp.where(is_last, h_fed.astype(h.dtype), h)

            step = (t - (n_stages - 1)) // m_mb
            valid = (t >= stage) & (t < stage + m_mb * n_steps)
            write = is_last & (t >= n_stages - 1)
            out = jnp.where(
                write,
                jax.lax.dynamic_update_slice(
                    out, nxt[None, None], (mb, jnp.maximum(step, 0), 0)
                ),
                out,
            )
            # commit cache/position advance only for valid ticks
            cache = jax.tree.map(
                lambda c, new: jnp.where(
                    valid,
                    jax.lax.dynamic_update_index_in_dim(c, new, mb, 1),
                    c,
                ),
                cache,
                cache_mb_new,
            )
            pos = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(pos, pos_mb + 1, mb, 0),
                pos,
            )
            buf = jax.lax.ppermute(h_out, "pp", shift)
            return (buf, cache, pos, out)

        buf0 = jnp.zeros((mb_b, 1, d), cfg.jdtype)
        out0 = jnp.zeros((m_mb, n_steps, mb_b), jnp.int32)
        _, _, _, out = jax.lax.fori_loop(
            0, n_ticks, tick, (buf0, cache0, pos0, out0)
        )
        # only the last stage holds real outputs
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), "pp"
        )

    stacked_sharded = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1))))
        ),
        stacked,
    )
    layer_specs = jax.tree.map(
        lambda v: P("pp", *([None] * (v.ndim - 1))), stacked
    )
    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(layer_specs, P(), P()),
        out_specs=P(),
        check_rep=False,
    )(stacked_sharded, tokens0, positions0)


def _schedule_1f1b(n_stages: int, n_mb: int):
    """Simulate the PipeDream-Flush (1F1B) schedule on the host.

    Returns (ops [T, P] int: 0 idle / 1 fwd / 2 bwd, mbs [T, P] int). The
    policy — backward has priority, forwards capped at P - s in flight —
    yields the classic 2(M + P - 1)-tick schedule whose peak activation
    stash is P - s microbatches per stage (GPipe stashes all M).
    """
    import collections

    import numpy as np

    acts = [collections.deque() for _ in range(n_stages)]
    grads = [collections.deque() for _ in range(n_stages)]
    for i in range(n_mb):
        acts[0].append(i)
    fwds = [0] * n_stages
    bwds = [0] * n_stages
    arrivals: list = []
    ops, mbs = [], []
    t = 0
    while sum(bwds) < n_stages * n_mb:
        assert t < 4 * (n_stages + n_mb), "schedule failed to converge"
        for (ta, kind, s, i) in [a for a in arrivals if a[0] == t]:
            (acts if kind == "f" else grads)[s].append(i)
        arrivals = [a for a in arrivals if a[0] > t]
        op_row, mb_row = [], []
        for s in range(n_stages):
            if grads[s]:
                i = grads[s].popleft()
                op_row.append(2)
                mb_row.append(i)
                bwds[s] += 1
                if s > 0:
                    arrivals.append((t + 1, "g", s - 1, i))
            elif acts[s] and (fwds[s] - bwds[s]) < (n_stages - s):
                i = acts[s].popleft()
                op_row.append(1)
                mb_row.append(i)
                fwds[s] += 1
                if s < n_stages - 1:
                    arrivals.append((t + 1, "f", s + 1, i))
                else:
                    # last stage: its own loss grad is ready next tick
                    arrivals.append((t + 1, "g", s, i))
            else:
                op_row.append(0)
                mb_row.append(0)
        ops.append(op_row)
        mbs.append(mb_row)
        t += 1
    import numpy as np

    return np.asarray(ops, np.int32), np.asarray(mbs, np.int32)


def pp_train_grads_1f1b(
    params,
    tokens,
    cfg,
    mesh: Mesh,
    *,
    n_microbatches: int = None,
    kernels: bool = False,
):
    """1F1B pipelined training: returns (grads like ``params``, loss).

    PipeDream-Flush schedule over the 'pp' ring (the GPipe ``pp_forward``
    has (P-1)/(M+P-1) bubble overhead and stashes every microbatch; 1F1B
    keeps at most P - s activations per stage and reaches the same
    bubble-free steady state with bwd interleaved). Every tick is one
    uniform SPMD program: a 3-way ``lax.switch`` (idle/fwd/bwd) selected by
    the host-precomputed schedule table, with two ppermutes carrying the
    fwd activation ring and the bwd gradient ring. Backward recomputes the
    stage forward from the stashed input (rematerialization).

    tokens: [B, S+1] int32 (causal LM: inputs = [:, :-1], targets =
    [:, 1:]); B divisible by n_microbatches.
    """
    import numpy as np

    n_stages = mesh.shape["pp"]
    stacked, shared = stack_stage_params(params, n_stages)
    b, s_tok = tokens.shape
    s_len = s_tok - 1
    m_mb = n_microbatches or n_stages
    assert b % m_mb == 0
    mb_b = b // m_mb
    d = cfg.dim
    ops_tab, mbs_tab = _schedule_1f1b(n_stages, m_mb)
    n_ticks = len(ops_tab)
    ops_tab = jnp.asarray(ops_tab)
    mbs_tab = jnp.asarray(mbs_tab)
    toks_mb = tokens.reshape(m_mb, mb_b, s_tok)
    shift_f = [(i, i + 1) for i in range(n_stages - 1)]
    shift_b = [(i + 1, i) for i in range(n_stages - 1)]

    def inner(stage_layers, toks_mb):
        stage_layers = jax.tree.map(lambda v: v[0], stage_layers)
        stage = jax.lax.axis_index("pp")
        is_first = stage == 0
        is_last = stage == n_stages - 1

        def stage_fn(layers, x):
            def body(carry, layer):
                return _block(carry, layer, cfg, kernels), None

            y, _ = jax.lax.scan(body, x, layers)
            return y

        def tail_loss(layers, sh, x, tgt):
            """last stage: stage fwd + norm + head + mean CE (× 1/m_mb)."""
            y = stage_fn(layers, x)
            h = llama.rmsnorm(y, sh["norm"], cfg.norm_eps, kernels=False)
            logits = llama._linear(
                h.reshape(mb_b * s_len, -1), sh["lm_head"], cfg, None, False
            ).reshape(mb_b, s_len, -1)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return -jnp.mean(ll) / m_mb

        zero_lg = jax.tree.map(jnp.zeros_like, stage_layers)
        zero_sh = {
            "norm": jnp.zeros_like(shared["norm"]),
            "lm_head": jnp.zeros_like(shared["lm_head"]),
            "embed": jnp.zeros_like(shared["embed"]),
        }
        stash0 = jnp.zeros((m_mb, mb_b, s_len, d), cfg.jdtype)
        gbuf0 = jnp.zeros((m_mb, mb_b, s_len, d), jnp.float32)

        state = dict(
            stash=stash0, gslot=gbuf0,
            fbuf=jnp.zeros((mb_b, s_len, d), cfg.jdtype),
            bbuf=jnp.zeros((mb_b, s_len, d), jnp.float32),
            lgrad=zero_lg, sgrad=zero_sh, loss=jnp.zeros((), jnp.float32),
        )

        for t in range(n_ticks):
            op = ops_tab[t, stage]
            mb = mbs_tab[t, stage]
            # deliver last tick's ring traffic per the static tables
            if t > 0:
                prev = jnp.maximum(stage - 1, 0)
                nxt = jnp.minimum(stage + 1, n_stages - 1)
                arr_f = (ops_tab[t - 1, prev] == 1) & ~is_first
                mb_f = mbs_tab[t - 1, prev]
                state["stash"] = jnp.where(
                    arr_f,
                    jax.lax.dynamic_update_index_in_dim(
                        state["stash"], state["fbuf"], mb_f, 0
                    ),
                    state["stash"],
                )
                arr_g = (ops_tab[t - 1, nxt] == 2) & ~is_last
                mb_g = mbs_tab[t - 1, nxt]
                state["gslot"] = jnp.where(
                    arr_g,
                    jax.lax.dynamic_update_index_in_dim(
                        state["gslot"], state["bbuf"], mb_g, 0
                    ),
                    state["gslot"],
                )
                # last stage's own loss-grad readiness needs no data: its
                # bwd recomputes the loss from the stashed input

            toks = toks_mb[mb]

            def do_idle(st):
                return st, jnp.zeros_like(state["fbuf"]), jnp.zeros_like(state["bbuf"])

            def do_fwd(st):
                x_in = jnp.where(
                    is_first,
                    jnp.take(shared["embed"], toks[:, :-1], axis=0).astype(cfg.jdtype),
                    jax.lax.dynamic_index_in_dim(st["stash"], mb, 0, keepdims=False),
                )
                st = dict(st)
                st["stash"] = jax.lax.dynamic_update_index_in_dim(
                    st["stash"], x_in, mb, 0
                )
                y = stage_fn(stage_layers, x_in)
                return st, y, jnp.zeros_like(state["bbuf"])

            def do_bwd(st):
                x_in = jax.lax.dynamic_index_in_dim(st["stash"], mb, 0, keepdims=False)
                st = dict(st)

                def last_branch():
                    loss, vjp = jax.vjp(
                        lambda l, sh, x: tail_loss(l, sh, x, toks[:, 1:]),
                        stage_layers, {k: shared[k] for k in ("norm", "lm_head")},
                        x_in,
                    )
                    dl, dsh, dx = vjp(jnp.ones((), jnp.float32))
                    return loss, dl, dsh["norm"], dsh["lm_head"], dx

                def mid_branch():
                    g = jax.lax.dynamic_index_in_dim(
                        st["gslot"], mb, 0, keepdims=False
                    )
                    _, vjp = jax.vjp(
                        lambda l, x: stage_fn(l, x), stage_layers, x_in
                    )
                    dl, dx = vjp(g.astype(cfg.jdtype))
                    return (jnp.zeros((), jnp.float32), dl,
                            jnp.zeros_like(shared["norm"]),
                            jnp.zeros_like(shared["lm_head"]), dx)

                loss, dl, dnorm, dhead, dx = jax.lax.cond(
                    is_last, last_branch, mid_branch
                )
                st["lgrad"] = jax.tree.map(
                    lambda a, g_: a + g_.astype(a.dtype), st["lgrad"], dl
                )
                st["sgrad"] = dict(st["sgrad"])
                st["sgrad"]["norm"] = st["sgrad"]["norm"] + dnorm.astype(
                    st["sgrad"]["norm"].dtype)
                st["sgrad"]["lm_head"] = st["sgrad"]["lm_head"] + dhead.astype(
                    st["sgrad"]["lm_head"].dtype)
                # stage 0: dx is w.r.t. the embedded input -> embed grads
                demb = jnp.where(
                    is_first,
                    jnp.zeros_like(st["sgrad"]["embed"]).at[toks[:, :-1]].add(
                        dx.astype(st["sgrad"]["embed"].dtype)
                    ),
                    jnp.zeros_like(st["sgrad"]["embed"]),
                )
                st["sgrad"]["embed"] = st["sgrad"]["embed"] + demb
                st["loss"] = st["loss"] + loss
                return st, jnp.zeros_like(state["fbuf"]), dx.astype(jnp.float32)

            state, y_send, dx_send = jax.lax.switch(
                op, [do_idle, do_fwd, do_bwd], state
            )
            if t != n_ticks - 1:
                state["fbuf"] = jax.lax.ppermute(y_send, "pp", shift_f)
                state["bbuf"] = jax.lax.ppermute(dx_send, "pp", shift_b)

        sgrad = jax.tree.map(lambda g: jax.lax.psum(g, "pp"), state["sgrad"])
        loss = jax.lax.psum(state["loss"], "pp")
        lgrad = jax.tree.map(lambda g: g[None], state["lgrad"])
        return lgrad, sgrad, loss

    stacked_sharded = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1))))
        ),
        stacked,
    )
    layer_specs = jax.tree.map(
        lambda v: P("pp", *([None] * (v.ndim - 1))), stacked
    )
    lgrad, sgrad, loss = shard_map(
        inner,
        mesh=mesh,
        in_specs=(layer_specs, P()),
        out_specs=(layer_specs, P(), P()),
        check_rep=False,
    )(stacked_sharded, toks_mb)

    # unstack [n_stages, per, ...] back into the flat layers list
    per = len(params["layers"]) // n_stages
    grads = {
        "embed": sgrad["embed"],
        "norm": sgrad["norm"],
        "lm_head": sgrad["lm_head"],
        "layers": [
            jax.tree.map(lambda v: v[i // per, i % per], lgrad)
            for i in range(len(params["layers"]))
        ],
    }
    return grads, loss
