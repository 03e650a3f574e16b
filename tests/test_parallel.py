"""S5 tests: mesh, TP/DP sharding, shard_map wrappers, train step.

Runs on the 8-virtual-device CPU mesh from conftest (the capability the
single-GPU reference never had — SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.parallel import (
    init_opt_state,
    make_mesh,
    shard_params,
    tp_decode_step,
    tp_forward,
    train_step,
)
from composable_kernel_tpu.utils.check_err import check_err

CFG = llama.tiny_config(quant="bf16")
PARAMS = llama.init_weights(CFG, jax.random.PRNGKey(0))
TOKENS = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, CFG.vocab_size)


def test_mesh_shape():
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_tp_forward_parity():
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(PARAMS, CFG, mesh)
    got = tp_forward(sharded, TOKENS, CFG, mesh, kernels=False)
    want = llama.forward(PARAMS, TOKENS, CFG, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_quantized():
    # tp_pack=4: row-parallel int4 weights packed in 4 K-blocks so each of
    # the 4 'tp' shards holds a self-contained split-halves sub-pack
    cfg = llama.tiny_config(quant="w4a16", tp_pack=4)
    qp = llama.quantize_weights(PARAMS, cfg)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want = llama.forward(qp, TOKENS, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_w4a8():
    # W4A8 leaves shard identically to w4a16 ({"q","s"} plan); each tp
    # shard quantizes its local activations per-token and runs the
    # int8-dot reference path; psum combines the row-parallel halves
    cfg = llama.tiny_config(quant="w4a8", tp_pack=4)
    qp = llama.quantize_weights(PARAMS, cfg)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want = llama.forward(qp, TOKENS, cfg, kernels=False)
    # per-shard activation quantization differs from the unsharded run
    # (row-parallel shards see only their K-slice when computing the
    # per-token absmax), so the gate is aggregate, not pointwise
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.06, rel


def test_tp_decode_parity():
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(PARAMS, CFG, mesh)
    cache = llama.init_kv_cache(CFG, 2)
    nxt = TOKENS[:, :1]
    got, _ = tp_decode_step(sharded, cache, nxt, 0, CFG, mesh, kernels=False)
    want, _ = llama.decode_step(PARAMS, cache, nxt, 0, CFG, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_decode_batched_fast_path():
    # continuous-batching decode under TP with the round-4 fast path live
    # per shard: fused-qkv w4a8 weights + int8 KV -> rope_quant_prep,
    # in-VMEM fresh-token fold-in, end-of-step slab rewrites, psum'd wo
    from composable_kernel_tpu.parallel import tp_decode_step_batched

    cfg = llama.tiny_config(quant="w4a8", tp_pack=2, fuse_qkv=True,
                            kv_quant="int8")
    qp = llama.quantize_weights(PARAMS, cfg)
    mesh = make_mesh(tp=2, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    cache = llama.init_kv_cache(cfg, 2)
    # seed distinct prefixes so per-slot masking is exercised
    import jax.random as jr

    for kv in cache:
        kv["k"] = jr.randint(jr.PRNGKey(5), kv["k"].shape, -90, 90,
                             jnp.int32).astype(kv["k"].dtype)
        kv["v"] = jr.randint(jr.PRNGKey(6), kv["v"].shape, -90, 90,
                             jnp.int32).astype(kv["v"].dtype)
        kv["ks"] = jnp.full_like(kv["ks"], 0.02)
        kv["vs"] = jnp.full_like(kv["vs"], 0.02)
    nxt = TOKENS[:, :1]
    pos = jnp.asarray([9, 21], jnp.int32)
    got, got_cache = tp_decode_step_batched(
        sharded, cache, nxt, pos, cfg, mesh, kernels=True
    )
    want, want_cache = llama.decode_step_batched(
        qp, cache, nxt, pos, cfg, kernels=True
    )
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    # per-shard activation quant differs from the unsharded run (local
    # absmax over the K-slice) -> aggregate gate, as in tp_forward tests
    assert rel < 0.06, rel
    # cache write structure: rows OTHER than positions[b] must be exactly
    # the seeded values (the deferred append touches one row per slot);
    # the written row tracks the unsharded run only statistically (TP
    # activations diverge in ulps through per-shard quant + psum order)
    pos_np = np.asarray(pos)
    for gc, wc, kv0 in zip(got_cache, want_cache, cache):
        for key in ("k", "v"):
            gk = np.asarray(gc[key], np.int32)
            wk = np.asarray(wc[key], np.int32)
            seed = np.asarray(kv0[key], np.int32)
            for slot in range(gk.shape[0]):
                p = pos_np[slot]
                mask = np.ones(gk.shape[2], bool)
                mask[p] = False
                np.testing.assert_array_equal(
                    gk[slot][:, mask], seed[slot][:, mask]
                )
                row_diff = np.abs(gk[slot][:, p] - wk[slot][:, p])
                # ~1 int8 ulp of drift across the row is the expected
                # TP-vs-unsharded numeric divergence; structure is what
                # this asserts (exactness is covered single-device)
                assert row_diff.mean() < 2.0 and row_diff.max() <= 16, (
                    row_diff.mean(), row_diff.max()
                )


def test_tp_forward_qwen2_biases():
    # Qwen2-style q/k/v projection biases shard column-parallel with their
    # weights (param_specs maps bq/bk/bv to P('tp'))
    cfg = llama.tiny_config(quant="bf16", qkv_bias=True)
    params = llama.init_weights(cfg, jax.random.PRNGKey(3))
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want = llama.forward(params, TOKENS, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_moe_ep():
    # MoE layers ride the tp axis as EP: expert stacks shard on dim 0,
    # tokens split -> all-to-all dispatch (moe_block_ep) -> all_gather
    cfg = llama.tiny_config(quant="bf16", dtype="float32", n_experts=4,
                            top_k_experts=2)
    params = llama.init_weights(cfg, jax.random.PRNGKey(4))
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    # expert stacks actually sharded over tp
    gate = sharded["layers"][0]["moe"]["w_gate"]
    assert "tp" in gate.sharding.spec
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=True)
    want = llama.forward(params, TOKENS, cfg, kernels=True)
    check_err(got, want, rtol=6e-2, atol=6e-2)
    # reference path exercises the replicated-token psum fallback
    got_ref = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want_ref = llama.forward(params, TOKENS, cfg, kernels=False)
    check_err(got_ref, want_ref, rtol=6e-2, atol=6e-2)


def test_tp_forward_moe_quantized():
    # int8 expert stacks keep the {"q","s"} leaves sharded per expert
    cfg = llama.tiny_config(quant="int8", dtype="float32", n_experts=4,
                            top_k_experts=2)
    params = llama.init_weights(llama.tiny_config(
        quant="bf16", dtype="float32", n_experts=4, top_k_experts=2),
        jax.random.PRNGKey(5))
    qp = llama.quantize_weights(params, cfg)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=True)
    want = llama.forward(qp, TOKENS, cfg, kernels=True)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_moe_w4a8():
    # w4a8 expert stacks carry a static "gs" group-size marker that must
    # NOT cross shard_map (P() would canonicalize it to a tracer and the
    # ragged kernel's k % group_size shape math would raise) — the
    # _strip_gs/_restore_gs pair keeps it a Python int inside
    cfg = llama.tiny_config(quant="w4a8", dtype="float32", n_experts=4,
                            top_k_experts=2, tp_pack=4)
    params = llama.init_weights(llama.tiny_config(
        quant="bf16", dtype="float32", n_experts=4, top_k_experts=2),
        jax.random.PRNGKey(7))
    qp = llama.quantize_weights(params, cfg)
    assert qp["layers"][0]["moe"]["w_gate"]["gs"] == cfg.group_size
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=True)
    want = llama.forward(qp, TOKENS, cfg, kernels=True)
    # per-shard activation quantization differs from the unsharded run
    # (row-parallel shards quantize their K-slice), and the shifted
    # attention outputs can flip top-k routing decisions near score ties —
    # discrete expert swaps on a few tokens. The aggregate gate is sized
    # to catch structural bugs (a broken shard plan measured rel=0.87)
    # while absorbing quant + routing noise (measured 0.066).
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.12, rel


def test_tp_decode_moe_fallback():
    # decode batch (2 tokens) is not divisible by ep=4: the replicated
    # psum fallback keeps decode correct under the same sharded tree
    cfg = llama.tiny_config(quant="bf16", dtype="float32", n_experts=4,
                            top_k_experts=2)
    params = llama.init_weights(cfg, jax.random.PRNGKey(6))
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    cache = llama.init_kv_cache(cfg, 2)
    nxt = TOKENS[:, :1]
    got, _ = tp_decode_step(sharded, cache, nxt, 0, cfg, mesh, kernels=True)
    want, _ = llama.decode_step(params, cache, nxt, 0, cfg, kernels=True)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_fused_trees():
    # round-2 gap closed: fused wqkv/w_gateup trees shard column-parallel
    # after the shard-local segment permutation (permute_fused_for_tp),
    # so single-chip decode's fusion win survives under TP
    cfg = llama.tiny_config(quant="bf16", fuse_qkv=True)
    params = llama.init_weights(cfg, jax.random.PRNGKey(9))
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want = llama.forward(params, TOKENS, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_forward_fused_trees_w4a16():
    cfg = llama.tiny_config(quant="w4a16", fuse_qkv=True, tp_pack=4)
    qp = llama.quantize_weights(PARAMS, cfg)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(qp, cfg, mesh)
    got = tp_forward(sharded, TOKENS, cfg, mesh, kernels=False)
    want = llama.forward(qp, TOKENS, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_tp_decode_fused_trees():
    cfg = llama.tiny_config(quant="bf16", fuse_qkv=True)
    params = llama.init_weights(cfg, jax.random.PRNGKey(10))
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(params, cfg, mesh)
    cache = llama.init_kv_cache(cfg, 2)
    nxt = TOKENS[:, :1]
    got, _ = tp_decode_step(sharded, cache, nxt, 0, cfg, mesh, kernels=False)
    want, _ = llama.decode_step(params, cache, nxt, 0, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_train_step():
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(PARAMS, CFG, mesh)
    opt = init_opt_state(sharded)
    toks = jax.random.randint(jax.random.PRNGKey(2), (4, 33), 0, CFG.vocab_size)
    new_p, new_opt, loss = train_step(sharded, opt, toks, CFG, mesh, lr=1e-2)
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0
    # params actually moved
    delta = float(
        jnp.abs(
            new_p["layers"][0]["wq"].astype(jnp.float32)
            - PARAMS["layers"][0]["wq"].astype(jnp.float32)
        ).max()
    )
    assert delta > 0

    # loss decreases over a few steps on the same batch
    p, o = new_p, new_opt
    first = loss
    for _ in range(3):
        p, o, loss = train_step(p, o, toks, CFG, mesh, lr=1e-2)
    assert float(loss) < first


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(causal):
    """Sequence-parallel ring attention == full-sequence reference."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from composable_kernel_tpu.parallel.ring_attention import ring_attention
    from composable_kernel_tpu.reference.attention import ref_attention

    mesh = make_mesh(tp=1, dp=8)  # ring over 'dp' (8 virtual devices)
    b, h, s, d = 1, 2, 512, 64
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32).astype(jnp.bfloat16)

    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "dp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "dp", None),) * 3,
        out_specs=P(None, None, "dp", None),
        check_rep=False,
    )
    got = f(q, k, v)
    want = ref_attention(q, k, v, causal=causal)
    check_err(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("n_stages,n_mb", [(4, 2), (2, 4)])
def test_pipeline_parallel(n_stages, n_mb):
    """'pp' pipelined forward == plain forward."""
    from composable_kernel_tpu.parallel.pipeline import make_pp_mesh, pp_forward

    cfg = llama.tiny_config(quant="bf16", n_layers=4)
    params = llama.init_weights(cfg, jax.random.PRNGKey(3))
    toks = jax.random.randint(jax.random.PRNGKey(4), (4, 16), 0, cfg.vocab_size)
    mesh = make_pp_mesh(n_stages)
    got = pp_forward(params, toks, cfg, mesh, n_microbatches=n_mb)
    want = llama.forward(params, toks, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_pipeline_parallel_quantized():
    from composable_kernel_tpu.parallel.pipeline import make_pp_mesh, pp_forward

    cfg = llama.tiny_config(quant="w4a16", n_layers=4)
    params = llama.quantize_weights(
        llama.init_weights(cfg, jax.random.PRNGKey(3)), cfg
    )
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, cfg.vocab_size)
    mesh = make_pp_mesh(2)
    got = pp_forward(params, toks, cfg, mesh, n_microbatches=2)
    want = llama.forward(params, toks, cfg, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_pp_decode_parity():
    """Token-level pipelined decode == sequential batched decode.

    f32 weights: greedy argmax ties in bf16 tiny models break differently
    under jit vs eager (see test_serving.py note).
    """
    from composable_kernel_tpu.parallel.pipeline import make_pp_mesh, pp_decode

    cfg = llama.tiny_config(quant="bf16", n_layers=4, dtype="float32")
    params = llama.init_weights(cfg, jax.random.PRNGKey(3))
    m_mb, mb_b, n_steps = 2, 2, 4
    toks0 = jax.random.randint(
        jax.random.PRNGKey(5), (m_mb, mb_b), 0, cfg.vocab_size
    )
    pos0 = jnp.zeros((m_mb, mb_b), jnp.int32)
    mesh = make_pp_mesh(2)
    got = pp_decode(params, toks0, pos0, cfg, mesh, n_steps=n_steps)
    assert got.shape == (m_mb, n_steps, mb_b)

    # sequential reference: same decode from empty caches, flattened batch
    b = m_mb * mb_b
    cache = llama.init_kv_cache(cfg, b)
    tok = toks0.reshape(b, 1)
    want = []
    for i in range(n_steps):
        logits, cache = llama.decode_step_batched(
            params, cache, tok, jnp.full((b,), i, jnp.int32), cfg,
            kernels=False,
        )
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        want.append(tok[:, 0])
    want = jnp.stack(want, axis=0).reshape(n_steps, m_mb, mb_b).transpose(1, 0, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hybrid_mesh_single_process():
    from composable_kernel_tpu.parallel import (
        MeshPlan, auto_mesh_plan, init_distributed, make_hybrid_mesh,
    )

    # single process: init is a no-op
    assert init_distributed() is False

    plan = MeshPlan(dcn={"dp": 2}, ici={"tp": 4})
    assert plan.axis_names == ("dp", "tp")
    assert plan.n_devices == 8
    mesh = make_hybrid_mesh(plan)
    assert mesh.shape == {"dp": 2, "tp": 4}
    # DCN axis leads (slowest-varying): tp rows are contiguous device ids
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    assert (np.diff(ids, axis=1) == 1).all()

    auto = auto_mesh_plan()
    assert auto.n_devices == len(jax.devices())
    # single-process default: all devices on the ICI (tp) axis
    assert auto.ici["tp"] == len(jax.devices())


def test_hybrid_mesh_runs_tp():
    """A hybrid-built mesh drives the same TP shard_map path."""
    from composable_kernel_tpu.parallel import MeshPlan, make_hybrid_mesh

    mesh = make_hybrid_mesh(MeshPlan(dcn={"dp": 2}, ici={"tp": 4}))
    sharded = shard_params(PARAMS, CFG, mesh)
    got = tp_forward(sharded, TOKENS, CFG, mesh, kernels=False)
    want = llama.forward(PARAMS, TOKENS, CFG, kernels=False)
    check_err(got, want, rtol=6e-2, atol=6e-2)


def test_pp_1f1b_grads_match_autodiff():
    """1F1B pipelined grads == single-device jax.grad on the same loss."""
    from composable_kernel_tpu.parallel.pipeline import (
        _schedule_1f1b,
        make_pp_mesh,
        pp_train_grads_1f1b,
    )

    # schedule sanity: every (stage, mb) gets exactly one fwd and one bwd
    ops, mbs = _schedule_1f1b(2, 4)
    assert len(ops) == 2 * (4 + 2 - 1)
    for s in range(2):
        f = [mbs[t][s] for t in range(len(ops)) if ops[t][s] == 1]
        b = [mbs[t][s] for t in range(len(ops)) if ops[t][s] == 2]
        assert sorted(f) == [0, 1, 2, 3] and sorted(b) == [0, 1, 2, 3]

    cfg = llama.tiny_config(quant="bf16", n_layers=4, dtype="float32")
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0, cfg.vocab_size)
    mesh = make_pp_mesh(2)
    grads, loss = pp_train_grads_1f1b(params, toks, cfg, mesh, n_microbatches=4)

    def ref_loss(p):
        logits = llama.forward(p, toks[:, :-1], cfg, kernels=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, toks[:, 1:, None], axis=-1)
        return -jnp.mean(ll)

    want_loss, want = jax.value_and_grad(ref_loss)(params)
    # pipelined loss averages per-microbatch means == global mean here
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    flat_g, _ = jax.tree.flatten(grads)
    flat_w, _ = jax.tree.flatten(want)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(w, np.float64),
            rtol=2e-4, atol=2e-5,
        )
