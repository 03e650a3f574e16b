"""Additional ckprof engines: conv, grouped GEMM, reduce, pool.

Completes the profiler surface toward ckProfiler's 60 front-ends
(profiler/src/profile_*.cpp): each engine runs, verifies against the host
reference, and reports a CK-style perf line.
"""

from __future__ import annotations

import numpy as np

from composable_kernel_tpu.profiler.cli import OPERATIONS, _env, _time, register


@register("conv_fwd")
def profile_conv_fwd(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.conv import conv_fwd
    from composable_kernel_tpu.reference.conv import ref_conv_fwd

    n, hw, c, k_out = (ns.batch, 56, 128, 256) if on_tpu else (2, 14, 16, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, c), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, k_out), jnp.float32).astype(jnp.bfloat16)
    flops = 2.0 * n * hw * hw * k_out * 9 * c
    fn = lambda x_, w_: conv_fwd(x_, w_, padding=((1, 1), (1, 1)))
    out = fn(x, w)
    ref = np.asarray(ref_conv_fwd(x, w, padding=(1, 1)), np.float64)
    err = np.abs(np.asarray(out, np.float64) - ref).max() / max(np.abs(ref).max(), 1e-9)
    r = _time(fn, x, w, flops=flops, on_tpu=on_tpu)
    print(f"conv_fwd {n}x{hw}x{hw}x{c}->{k_out}: {r.avg_ms:.4f} ms "
          f"{r.tflops:.2f} TFlops (rel err {err:.2e})")


@register("grouped_gemm")
def profile_grouped_gemm(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.gemm.api import grouped_gemm

    from composable_kernel_tpu.ops.gemm.config import GemmConfig

    g, m_per, k, n = (8, 256, 1024, 1024) if on_tpu else (4, 32, 128, 128)
    a = jax.random.normal(jax.random.PRNGKey(0), (g * m_per, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (g, k, n), jnp.float32).astype(jnp.bfloat16)
    sizes = jnp.full((g,), m_per, jnp.int32)
    # ragged contract: group sizes must be multiples of block_m
    cfg = GemmConfig(block_m=min(m_per, 128), block_n=512, block_k=512)
    fn = lambda a_, b_: grouped_gemm(sizes, a_, b_, config=cfg)
    out = np.asarray(fn(a, b), np.float64)
    want = np.concatenate([
        np.asarray(a[i * m_per : (i + 1) * m_per], np.float64)
        @ np.asarray(b[i], np.float64)
        for i in range(g)
    ])
    err = np.abs(out - want).max() / max(np.abs(want).max(), 1e-9)
    r = _time(fn, a, b, flops=2.0 * g * m_per * k * n, on_tpu=on_tpu)
    print(f"grouped_gemm G{g} {m_per}x{n}x{k}: {r.avg_ms:.4f} ms "
          f"{r.tflops:.2f} TFlops (rel err {err:.2e})")


@register("reduce")
def profile_reduce(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.reduction import reduce as ckt_reduce

    rows, cols = (8192, 8192) if on_tpu else (256, 256)
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, cols), jnp.float32)
    fn = lambda x_: ckt_reduce(x_, (1,), "add")
    r = _time(fn, x, flops=0, on_tpu=on_tpu)
    gb = x.size * 4 / 1e9
    print(f"reduce add {rows}x{cols}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")


@register("pool")
def profile_pool(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.pool import max_pool

    n, hw, c = (8, 112, 128) if on_tpu else (2, 16, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, c), jnp.float32)
    fn = lambda x_: max_pool(x_, (2, 2))
    r = _time(fn, x, flops=0, on_tpu=on_tpu)
    gb = x.size * 4 / 1e9
    print(f"max_pool2x2 {n}x{hw}x{hw}x{c}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")


@register("attention_bwd")
def profile_attention_bwd(ns):
    """fmha backward engine (CK profile analog: fmha_bwd dq/dk/dv kernels)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.attention.backward import flash_attention_grad
    from composable_kernel_tpu.profiler.cli import record

    b, hq, hkv, sq, sk, d = ns.batch, ns.heads, ns.kv_heads or ns.heads, ns.m, ns.n, ns.k
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)

    fwd = lambda q_, k_, v_: flash_attention_grad(
        q_, k_, v_, causal=ns.causal, interpret=not on_tpu
    )
    _, f_vjp = jax.vjp(fwd, q, k, v)
    bwd = lambda do_: f_vjp(do_)[0]
    # bwd recomputes QK^T + P and runs 4 more matmuls: ~2.5x the fwd work
    flops = 2.5 * 4.0 * b * hq * sq * sk * d * (0.5 if ns.causal else 1.0)
    r = _time(bwd, do, flops=flops, on_tpu=on_tpu)
    record("fmha_bwd_default", r)
    print(f"attention_bwd B{b} Hq{hq} Hkv{hkv} Sq{sq} Sk{sk} D{d} "
          f"causal={ns.causal}: {r.avg_ms:.4f} ms {r.tflops:.2f} TFlops")


@register("int8_gemm")
def profile_int8_gemm(ns):
    """int8 x int8 requant engine (CK profile_gemm int8 / quantization ops)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops import epilogues as ep
    from composable_kernel_tpu.ops.quant import int8_gemm
    from composable_kernel_tpu.profiler.cli import record
    from composable_kernel_tpu.reference.quant import ref_int8_gemm_requant

    m, n, k = ns.m, ns.n, ns.k
    rng = np.random.default_rng(0)
    a_q = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
    b_q = jnp.asarray(rng.integers(-128, 128, (k, n)), jnp.int8)
    op = ep.activation_mul_clamp(ep.relu, 0.013)
    fn = lambda a_, b_: int8_gemm(a_, b_, op, interpret=not on_tpu)
    ok = True
    if ns.verify:
        sl = min(m, 64)
        got = np.asarray(fn(a_q, b_q)[:sl])
        want = np.asarray(ref_int8_gemm_requant(a_q[:sl], b_q, op))
        ok = bool((got == want).all())  # integer path: bit-exact
    r = _time(fn, a_q, b_q, flops=2.0 * m * n * k, on_tpu=on_tpu)
    record("int8_requant_relu", r, ok)
    print(f"int8_gemm {m}x{n}x{k}: {r.avg_ms:.4f} ms {r.tflops:.2f} TOPS "
          f"(bit-exact={ok})")


@register("fp8_gemm")
def profile_fp8_gemm(ns):
    """fp8 blockwise ab-scale engine (CK gemm_multiply_multiply fp8 ab-scale)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.quant.fp8 import SCALE_K, fp8_gemm_ab_scale
    from composable_kernel_tpu.profiler.cli import record

    m, n, k = ns.m, ns.n, ns.k
    assert k % SCALE_K == 0 and n % SCALE_K == 0, "fp8 needs K,N % 128 == 0"
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    a = jax.random.normal(ks[0], (m, k), jnp.float32).astype(jnp.float8_e4m3fn)
    b = jax.random.normal(ks[1], (k, n), jnp.float32).astype(jnp.float8_e4m3fn)
    a_s = jnp.ones((m, k // SCALE_K), jnp.float32)
    b_s = jnp.ones((k // SCALE_K, n // SCALE_K), jnp.float32)
    fn = lambda a_, b_: fp8_gemm_ab_scale(a_, a_s, b_, b_s, interpret=not on_tpu)
    ok = True
    if ns.verify:
        got = np.asarray(fn(a, b), np.float64)
        want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
        ok = bool(np.abs(got - want).max() / max(np.abs(want).max(), 1e-9) < 0.05)
    r = _time(fn, a, b, flops=2.0 * m * n * k, on_tpu=on_tpu)
    record("fp8_ab_scale", r, ok)
    print(f"fp8_gemm {m}x{n}x{k}: {r.avg_ms:.4f} ms {r.tflops:.2f} TFlops "
          f"(ok={ok})")


@register("norm_bwd")
def profile_norm_bwd(ns):
    """normalization backward engine (CK profile norm bwd-data/bwd-gamma-beta)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.normalization import layernorm, norm_bwd
    from composable_kernel_tpu.profiler.cli import record

    rows, cols = ns.m, ns.n
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (rows, cols), jnp.float32)
    dy = jax.random.normal(ks[1], (rows, cols), jnp.float32)
    g = jnp.ones((cols,), jnp.float32)
    b = jnp.zeros((cols,), jnp.float32)
    _, mean, inv = layernorm(x, g, b, save_stats=True, interpret=not on_tpu)
    fn = lambda dy_: norm_bwd(dy_, x, g, mean, inv, interpret=not on_tpu)[0]
    r = _time(fn, dy, flops=0, on_tpu=on_tpu)
    gb = 3 * x.size * 4 / 1e9  # dy + x read, dx written
    r.gbps = gb / (r.avg_ms / 1e3)
    record("norm_bwd_data_gb", r)
    print(f"norm_bwd {rows}x{cols}: {r.avg_ms:.4f} ms, {r.gbps:.1f} GB/s")


@register("batched_gemm")
def profile_batched_gemm(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.gemm.api import batched_gemm
    from composable_kernel_tpu.profiler.cli import record
    from composable_kernel_tpu.tuning.registry import registry

    g = ns.batch
    m, n, k = ns.m, ns.n, ns.k
    a = jax.random.normal(jax.random.PRNGKey(0), (g, m, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (g, k, n), jnp.float32).astype(jnp.bfloat16)
    ok = True
    cfgs = registry.get_instances("batched_gemm", m, n, k)[:4]
    from composable_kernel_tpu.profiler.cli import _run_instances, _check_rel
    want = None
    if ns.verify:
        want = np.einsum("gmk,gkn->gmn", np.asarray(a, np.float64),
                         np.asarray(b, np.float64))
    print(f"batched_gemm G{g} {m}x{n}x{k}: {len(cfgs)} instances")
    _run_instances(
        cfgs,
        lambda cfg: (lambda a_, b_: batched_gemm(a_, b_, config=cfg,
                                                 interpret=not on_tpu)),
        (a, b),
        want,
        _check_rel(0.02),
        2.0 * g * m * n * k,
        on_tpu,
    )


@register("contraction")
def profile_contraction(ns):
    """multi-dim M/N/K contraction engine (CK profile_contraction)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.contraction import contraction
    from composable_kernel_tpu.profiler.cli import record

    m0, m1, n0, n1, k0 = (32, ns.m // 32, 32, ns.n // 32, ns.k)
    a = jax.random.normal(jax.random.PRNGKey(0), (m0, m1, k0), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k0, n0, n1), jnp.float32).astype(jnp.bfloat16)
    fn = lambda a_, b_: contraction(a_, b_, (0, 1), (1, 2), ((2, 0),),
                                    interpret=not on_tpu)
    ok = True
    if ns.verify:
        got = np.asarray(fn(a, b), np.float64)
        want = np.einsum("abk,kcd->abcd", np.asarray(a, np.float64),
                         np.asarray(b, np.float64))
        ok = bool(np.abs(got - want).max() / max(np.abs(want).max(), 1e-9) < 0.02)
    r = _time(fn, a, b, flops=2.0 * m0 * m1 * n0 * n1 * k0, on_tpu=on_tpu)
    record("contraction_2x2x1", r, ok)
    print(f"contraction [{m0}x{m1}]x[{n0}x{n1}]x{k0}: {r.avg_ms:.4f} ms "
          f"{r.tflops:.2f} TFlops (ok={ok})")


@register("decode")
def profile_decode(ns):
    """W4A16 decode-shape weight-stream sweep (BASELINE config 2;
    CK analog: script/profile_mixed_gemm.sh decode shapes)."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.quant import wo_quant_gemm
    from composable_kernel_tpu.profiler.cli import record
    from composable_kernel_tpu.reference.quant import ref_quantize_group

    n, k, g = ns.n, ns.k, ns.group or 128
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    w_q, s = ref_quantize_group(w, group_size=g, bits=4)
    packed = dtypes.pack_int4(w_q, axis=0)
    wb = float(packed.size + s.size * 4)
    for m in (1, 8, 16, 32, 64):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
        fn = lambda a_, b_, s_: wo_quant_gemm(a_, b_, s_, group_size=g,
                                              packed_int4=True,
                                              interpret=not on_tpu)
        r = _time(fn, a, packed, s, flops=2.0 * m * n * k, on_tpu=on_tpu)
        r.gbps = wb / 1e9 / (r.avg_ms / 1e3)
        record(f"decode_m{m}", r)
        print(f"decode M={m} {k}x{n} g={g}: {r.avg_ms*1e3:.1f} us, "
              f"{r.gbps:.1f} GB/s weight stream")


@register("decode_attention")
def profile_decode_attention(ns):
    """Head-grouped decode attention (dense + paged) KV-stream sweep."""
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu.ops.attention import paged_flash_decode
    from composable_kernel_tpu.ops.attention.paged import decode_attention
    from composable_kernel_tpu.profiler.cli import record
    from composable_kernel_tpu.reference.attention import ref_attention

    b, hq, hkv, d = ns.batch, ns.heads, ns.kv_heads or ns.heads, ns.k
    sk = ns.n
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    lens = jnp.full((b,), int(sk * 0.75), jnp.int32)
    live_bytes = float(2 * b * hkv * int(sk * 0.75) * d * 2)
    if ns.verify:
        got = np.asarray(
            decode_attention(q, k, v, kv_seq_len=lens, interpret=not on_tpu)
            .astype(jnp.float32))
        want = np.asarray(ref_attention(q, k, v, kv_seq_len=lens,
                                        out_dtype=jnp.float32))
        assert np.abs(got - want).max() < 0.05

    fn = lambda q_, k_, v_: decode_attention(q_, k_, v_, kv_seq_len=lens,
                                             interpret=not on_tpu)
    r = _time(fn, q, k, v, flops=0, on_tpu=on_tpu)
    r.gbps = live_bytes / 1e9 / (r.avg_ms / 1e3)
    record("dense_head_grouped", r)
    print(f"dense decode_attention B{b} H{hq}/{hkv} Sk{sk}: "
          f"{r.avg_ms:.3f} ms, live-KV {r.gbps:.1f} GB/s")

    # paged variant over the same content
    page = 128
    per = sk // page
    n_pages = 1 + b * per
    table = jnp.arange(1, n_pages, dtype=jnp.int32).reshape(b, per)
    k_pool = k.reshape(b, hkv, per, page, d).transpose(0, 2, 1, 3, 4)
    k_pool = jnp.concatenate(
        [jnp.zeros((1, hkv, page, d), k.dtype),
         k_pool.reshape(b * per, hkv, page, d)])
    v_pool = v.reshape(b, hkv, per, page, d).transpose(0, 2, 1, 3, 4)
    v_pool = jnp.concatenate(
        [jnp.zeros((1, hkv, page, d), v.dtype),
         v_pool.reshape(b * per, hkv, page, d)])
    fn2 = lambda q_, kp, vp: paged_flash_decode(q_, kp, vp, table, lens,
                                                interpret=not on_tpu)
    r2 = _time(fn2, q, k_pool, v_pool, flops=0, on_tpu=on_tpu)
    r2.gbps = live_bytes / 1e9 / (r2.avg_ms / 1e3)
    record("paged_page128", r2)
    print(f"paged decode_attention:             "
          f"{r2.avg_ms:.3f} ms, live-KV {r2.gbps:.1f} GB/s")


@register("quant_attention")
def profile_quant_attention(ns):
    """Static-quant int8 QKV attention (fp8-pipeline analog) vs bf16."""
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu.ops.attention import flash_attention
    from composable_kernel_tpu.profiler.cli import record
    from composable_kernel_tpu.reference.attention import (
        ref_attention,
        ref_quantize_per_tensor,
    )

    b, hq, hkv, s, d = ns.batch, ns.heads, ns.kv_heads or ns.heads, ns.n, ns.k
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    qq, qs = ref_quantize_per_tensor(q)
    kq, ks = ref_quantize_per_tensor(k)
    vq, vs = ref_quantize_per_tensor(v)
    flops = 2.0 * b * hq * s * s * (d + d) / 2.0
    if ns.verify:
        got = np.asarray(flash_attention(
            qq, kq, vq, static_quant_scales=(qs, ks, vs), causal=True,
            interpret=not on_tpu).astype(jnp.float32))
        want = np.asarray(ref_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=True, out_dtype=jnp.float32))
        assert np.abs(got - want).max() < 0.15
    fn = lambda a, b_, c: flash_attention(
        a, b_, c, static_quant_scales=(qs, ks, vs), causal=True,
        interpret=not on_tpu)
    r = _time(fn, qq, kq, vq, flops=flops, on_tpu=on_tpu)
    record("static_quant_int8", r)
    print(f"static-quant attention B{b} H{hq}/{hkv} S{s} D{d}: "
          f"{r.avg_ms:.3f} ms, {r.tflops:.1f} TOPS-eff")


@register("varlen_attention")
def profile_varlen_attention(ns):
    """Packed group-mode attention engines (CK fmha group mode,
    fmha_fwd_kernel.hpp:505-555): (a) packed-varlen self-attention vs the
    padded flash path, (b) the varlen-CACHE chunk kernel (packed chunk
    queries vs per-slot caches — the chunked-prefill composition) vs the
    padded per-slot chunk attention."""
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.attention import (
        flash_attention,
        flash_attention_varlen,
        flash_attention_varlen_cache,
        pack_varlen,
    )
    from composable_kernel_tpu.profiler.cli import record

    def _host_ref(q_, k_, v_, offs):
        # f64 host softmax: NEVER use an on-TPU matmul as the golden
        # reference (f32 matmuls run one-pass bf16 on this backend)
        L, Hq, dd = q_.shape
        Lk = k_.shape[0]
        g = Hq // k_.shape[1]
        q64 = np.asarray(q_, np.float64)
        k64 = np.repeat(np.asarray(k_, np.float64), g, axis=1)
        v64 = np.repeat(np.asarray(v_, np.float64), g, axis=1)
        sc = np.einsum("qhd,khd->hqk", q64, k64) / np.sqrt(dd)
        qpos = offs + np.arange(L)[:, None]
        mask = np.arange(Lk)[None, :] <= qpos
        sc = np.where(mask[None], sc, -1e30)
        pp = np.exp(sc - sc.max(-1, keepdims=True))
        pp /= pp.sum(-1, keepdims=True)
        return np.einsum("hqk,khd->qhd", pp, v64)

    hq, hkv, d = ns.heads, ns.kv_heads or ns.heads, ns.k
    lens = ([2048, 1024, 512, 512, 256, 128] if on_tpu
            else [200, 96, 64])
    keys = jax.random.split(jax.random.PRNGKey(0), 3 * len(lens))
    qs = [jax.random.normal(keys[3 * i], (L, hq, d), jnp.float32
                            ).astype(jnp.bfloat16) for i, L in enumerate(lens)]
    ks = [jax.random.normal(keys[3 * i + 1], (L, hkv, d), jnp.float32
                            ).astype(jnp.bfloat16) for i, L in enumerate(lens)]
    vs = [jax.random.normal(keys[3 * i + 2], (L, hkv, d), jnp.float32
                            ).astype(jnp.bfloat16) for i, L in enumerate(lens)]
    bq, bk = (512, 1024) if on_tpu else (128, 128)
    qp, q_starts, q_lens = pack_varlen(qs, bq)
    kp, kv_starts, kv_lens = pack_varlen(ks, bk)
    vp, _, _ = pack_varlen(vs, bk)
    if ns.verify:
        got = np.asarray(flash_attention_varlen(
            qp, kp, vp, q_starts, q_lens, kv_starts, kv_lens,
            causal=True, block_q=bq, block_k=bk, interpret=not on_tpu,
        ).astype(jnp.float32))
        for i, (s0, L) in enumerate(zip(np.asarray(q_starts), lens)):
            want_i = _host_ref(qs[i], ks[i], vs[i], 0)
            err = np.abs(got[s0:s0 + L] - want_i).max()
            assert err < 0.05, (i, err)
    fn = lambda q_, k_, v_: flash_attention_varlen(
        q_, k_, v_, q_starts, q_lens, kv_starts, kv_lens,
        causal=True, block_q=bq, block_k=bk, interpret=not on_tpu)
    flops = sum(4.0 * hq * L * L * d * 0.5 for L in lens)
    r = _time(fn, qp, kp, vp, flops=flops, on_tpu=on_tpu)
    record("varlen_packed", r)
    # padded comparator: every sequence padded to max(lens)
    smax = max(lens)
    b = len(lens)
    qd = jnp.stack([jnp.pad(q, ((0, smax - q.shape[0]), (0, 0), (0, 0)))
                    for q in qs]).transpose(0, 2, 1, 3)
    kd = jnp.stack([jnp.pad(k, ((0, smax - k.shape[0]), (0, 0), (0, 0)))
                    for k in ks]).transpose(0, 2, 1, 3)
    vd = jnp.stack([jnp.pad(v, ((0, smax - v.shape[0]), (0, 0), (0, 0)))
                    for v in vs]).transpose(0, 2, 1, 3)
    lens_j = jnp.asarray(lens, jnp.int32)
    fn_pad = lambda q_, k_, v_: flash_attention(
        q_, k_, v_, causal=True, kv_seq_len=lens_j, causal_offset=jnp.zeros(
            (b,), jnp.int32), interpret=not on_tpu)
    r_pad = _time(fn_pad, qd, kd, vd, flops=flops, on_tpu=on_tpu)
    record("padded_flash", r_pad)
    print(f"varlen_attention H{hq}/{hkv} D{d} lens={lens}: packed "
          f"{r.avg_ms:.3f} ms vs padded {r_pad.avg_ms:.3f} ms "
          f"({r_pad.avg_ms / r.avg_ms:.2f}x)")

    # ---- (b) varlen-CACHE chunk kernel vs padded chunk attention -------
    c = 512 if on_tpu else 128
    s_max = 4096 if on_tpu else 256
    e_n = len(lens)
    pos = jnp.asarray([min(L * 2, s_max - c) // c * c for L in lens],
                      jnp.int32)
    ck_keys = jax.random.split(jax.random.PRNGKey(7), 3)
    cache_k = jax.random.normal(ck_keys[0], (e_n, hkv, s_max, d), jnp.float32
                                ).astype(jnp.bfloat16)
    cache_v = jax.random.normal(ck_keys[1], (e_n, hkv, s_max, d), jnp.float32
                                ).astype(jnp.bfloat16)
    q_chunk = jax.random.normal(ck_keys[2], (e_n * c, hq, d), jnp.float32
                                ).astype(jnp.bfloat16)
    starts_c = jnp.arange(e_n, dtype=jnp.int32) * c
    lens_c = jnp.full((e_n,), c, jnp.int32)
    kv_lens_c = pos + c
    if ns.verify:
        got = np.asarray(flash_attention_varlen_cache(
            q_chunk, cache_k, cache_v, starts_c, lens_c, kv_lens_c,
            block_q=min(512, c), interpret=not on_tpu).astype(jnp.float32))
        for i in range(e_n):
            kl = int(np.asarray(kv_lens_c)[i])
            want_i = _host_ref(
                q_chunk[i * c:(i + 1) * c],
                np.asarray(cache_k[i, :, :kl]).transpose(1, 0, 2),
                np.asarray(cache_v[i, :, :kl]).transpose(1, 0, 2),
                kl - c,
            )
            err = np.abs(got[i * c:(i + 1) * c] - want_i).max()
            assert err < 0.05, (i, err)
    fn_c = lambda q_, k_, v_: flash_attention_varlen_cache(
        q_, k_, v_, starts_c, lens_c, kv_lens_c, block_q=min(512, c),
        interpret=not on_tpu)
    flops_c = float(sum(4.0 * hq * c * int(kl) * d
                        for kl in np.asarray(kv_lens_c)))
    r_c = _time(fn_c, q_chunk, cache_k, cache_v, flops=flops_c, on_tpu=on_tpu)
    record("varlen_cache_chunk", r_c)
    q4 = q_chunk.reshape(e_n, c, hq, d).transpose(0, 2, 1, 3)
    fn_cp = lambda q_, k_, v_: flash_attention(
        q_, k_, v_, causal=True, kv_seq_len=kv_lens_c, causal_offset=pos,
        interpret=not on_tpu)
    r_cp = _time(fn_cp, q4, cache_k, cache_v, flops=flops_c, on_tpu=on_tpu)
    record("padded_chunk_flash", r_cp)
    print(f"varlen_cache chunk e={e_n} c={c} s_max={s_max}: packed "
          f"{r_c.avg_ms:.3f} ms vs padded chunk {r_cp.avg_ms:.3f} ms")
