"""In-place KV-cache row-update kernels vs the jnp scatter reference.

Covers ops/kv_update.py: the contiguous slab-rewrite kernel
(decode_step_batched's append) and the paged-pool variant
(paged_decode_step's page append). Both must be bit-exact against the
dynamic_update_slice / .at[].set formulations they replace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops.kv_update import (
    kv_cache_append_chunk,
    kv_cache_update,
    kv_cache_update_paged,
    kv_cache_update_paged_chunk,
)

KEY = jax.random.PRNGKey(0)


def _rand(key, shape, dtype):
    x = jax.random.normal(key, shape, jnp.float32) * 4.0
    if jnp.dtype(dtype) == jnp.int8:
        return jnp.clip(jnp.round(x * 8), -127, 127).astype(jnp.int8)
    return x.astype(dtype)


class TestContiguous:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8, jnp.float32])
    def test_matches_scatter(self, dtype):
        b, h, s, d = 4, 2, 64, 128
        ks = jax.random.split(KEY, 4)
        kc = _rand(ks[0], (b, h, s, d), dtype)
        vc = _rand(ks[1], (b, h, s, d), dtype)
        kn = _rand(ks[2], (b, h, 1, d), dtype)
        vn = _rand(ks[3], (b, h, 1, d), dtype)
        # positions exercising slab row 0, interior, last row, last slab
        pos = jnp.asarray([0, 13, 31, s - 1], jnp.int32)

        def ref(c, new):
            return jax.vmap(
                lambda cb, nb, p: jax.lax.dynamic_update_slice(
                    cb, nb, (0, p, 0)
                )
            )(c, new, pos)

        want_k, want_v = ref(kc, kn), ref(vc, vn)
        got_k, got_v = kv_cache_update(kc, vc, kn, vn, pos)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))



class TestPaged:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
    def test_matches_scatter(self, dtype):
        n_pages, h, page, d = 7, 2, 128, 128
        b = 4
        ks = jax.random.split(KEY, 4)
        kp = _rand(ks[0], (n_pages, h, page, d), dtype)
        vp = _rand(ks[1], (n_pages, h, page, d), dtype)
        kn = _rand(ks[2], (b, h, 1, d), dtype)
        vn = _rand(ks[3], (b, h, 1, d), dtype)
        # disjoint live pages (the engine invariant); offsets cover slab
        # boundaries and the last page row
        pages = jnp.asarray([1, 3, 4, 6], jnp.int32)
        off = jnp.asarray([0, 31, 32, page - 1], jnp.int32)

        def ref(pool, new):
            return pool.at[pages, :, off].set(new[:, :, 0, :])

        want_k, want_v = ref(kp, kn), ref(vp, vn)
        got_k, got_v = kv_cache_update_paged(kp, vp, kn, vn, pages, off)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))

    def test_null_page_collisions_leave_live_pages_intact(self):
        """Inactive slots all target page 0; live pages must be exact."""
        n_pages, h, page, d = 5, 2, 128, 128
        b = 4
        ks = jax.random.split(KEY, 4)
        kp = _rand(ks[0], (n_pages, h, page, d), jnp.bfloat16)
        vp = _rand(ks[1], (n_pages, h, page, d), jnp.bfloat16)
        kn = _rand(ks[2], (b, h, 1, d), jnp.bfloat16)
        vn = _rand(ks[3], (b, h, 1, d), jnp.bfloat16)
        pages = jnp.asarray([2, 0, 0, 4], jnp.int32)  # slots 1/2 inactive
        off = jnp.asarray([40, 0, 0, 17], jnp.int32)
        got_k, got_v = kv_cache_update_paged(kp, vp, kn, vn, pages, off)
        for slot, pg in ((0, 2), (3, 4)):
            want = kp[pg].at[:, off[slot]].set(kn[slot, :, 0])
            np.testing.assert_array_equal(
                np.asarray(got_k[pg]), np.asarray(want)
            )
            want_v = vp[pg].at[:, off[slot]].set(vn[slot, :, 0])
            np.testing.assert_array_equal(
                np.asarray(got_v[pg]), np.asarray(want_v)
            )
        # untouched pages stay bit-identical
        for pg in (1, 3):
            np.testing.assert_array_equal(
                np.asarray(got_k[pg]), np.asarray(kp[pg])
            )


class TestPagedChunk:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
    @pytest.mark.parametrize("c", [1, 4, 7, 33])
    def test_matches_per_offset_scatter(self, dtype, c):
        n_pages, h, page, d = 9, 2, 128, 128
        b = 3
        ks = jax.random.split(KEY, 4)
        kp = _rand(ks[0], (n_pages, h, page, d), dtype)
        vp = _rand(ks[1], (n_pages, h, page, d), dtype)
        kn = _rand(ks[2], (b, h, c, d), dtype)
        vn = _rand(ks[3], (b, h, c, d), dtype)
        # disjoint per-slot page spans (engine invariant); positions chosen
        # to exercise: slab straddle, page straddle, slab-aligned start
        table = jnp.asarray([[1, 2, 0], [3, 4, 0], [5, 6, 7]], jnp.int32)
        pos = jnp.asarray([30, 127, 64], jnp.int32)

        def ref(pool, new):
            out = pool
            for i in range(c):
                pg = table[jnp.arange(b), (pos + i) // page]
                off = (pos + i) % page
                out = out.at[pg, :, off].set(new[:, :, i, :])
            return out

        want_k, want_v = ref(kp, kn), ref(vp, vn)
        got_k, got_v = kv_cache_update_paged_chunk(
            kp, vp, kn, vn, table, pos, page=page
        )
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))

    def test_inactive_slots_null_page(self):
        n_pages, h, page, d = 5, 2, 128, 128
        b, c = 2, 4
        ks = jax.random.split(KEY, 4)
        kp = _rand(ks[0], (n_pages, h, page, d), jnp.bfloat16)
        vp = _rand(ks[1], (n_pages, h, page, d), jnp.bfloat16)
        kn = _rand(ks[2], (b, h, c, d), jnp.bfloat16)
        vn = _rand(ks[3], (b, h, c, d), jnp.bfloat16)
        table = jnp.asarray([[2, 3], [0, 0]], jnp.int32)  # slot 1 inactive
        pos = jnp.asarray([126, 0], jnp.int32)  # slot 0 straddles pages
        got_k, _ = kv_cache_update_paged_chunk(
            kp, vp, kn, vn, table, pos, page=page
        )
        # live pages exact
        want2 = kp[2].at[:, 126:128].set(kn[0, :, :2])
        want3 = kp[3].at[:, 0:2].set(kn[0, :, 2:])
        np.testing.assert_array_equal(np.asarray(got_k[2]), np.asarray(want2))
        np.testing.assert_array_equal(np.asarray(got_k[3]), np.asarray(want3))
        # untouched live pages bit-identical
        np.testing.assert_array_equal(np.asarray(got_k[1]), np.asarray(kp[1]))
        np.testing.assert_array_equal(np.asarray(got_k[4]), np.asarray(kp[4]))


class TestAppendChunk:
    """Packed chunk-round append (kv_cache_append_chunk): masked c-row
    slab rewrites at per-entry (slot, pos, len) — the contiguous-cache
    write path of the packed chunked-prefill wave."""

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
    def test_matches_masked_scatter(self, dtype):
        b, h, s_max, d, c = 5, 2, 256, 128, 64
        keys = jax.random.split(KEY, 4)
        kc = _rand(keys[0], (b, h, s_max, d), dtype)
        vc = _rand(keys[1], (b, h, s_max, d), dtype)
        kn = _rand(keys[2], (3, h, c, d), dtype)
        vn = _rand(keys[3], (3, h, c, d), dtype)
        slots = jnp.asarray([4, 0, 2], jnp.int32)
        pos = jnp.asarray([64, 128, 0], jnp.int32)
        lens = jnp.asarray([64, 30, 0], jnp.int32)  # full, partial, dead

        want_k, want_v = np.asarray(kc).copy(), np.asarray(vc).copy()
        for e in range(3):
            sl, p0, li = int(slots[e]), int(pos[e]), int(lens[e])
            want_k[sl, :, p0 : p0 + li] = np.asarray(kn)[e, :, :li]
            want_v[sl, :, p0 : p0 + li] = np.asarray(vn)[e, :, :li]

        got_k, got_v = kv_cache_append_chunk(kc, vc, kn, vn, slots, pos, lens)
        np.testing.assert_array_equal(np.asarray(got_k), want_k)
        np.testing.assert_array_equal(np.asarray(got_v), want_v)

    def test_dead_entry_aliasing_slot0_keeps_cache(self):
        # bucket-padding entries point at slot 0 with len 0: slot 0's
        # cache must come through bit-identical
        b, h, s_max, d, c = 2, 2, 128, 128, 32
        keys = jax.random.split(KEY, 4)
        kc = _rand(keys[0], (b, h, s_max, d), jnp.bfloat16)
        vc = _rand(keys[1], (b, h, s_max, d), jnp.bfloat16)
        kn = _rand(keys[2], (2, h, c, d), jnp.bfloat16)
        vn = _rand(keys[3], (2, h, c, d), jnp.bfloat16)
        slots = jnp.asarray([1, 0], jnp.int32)
        pos = jnp.asarray([32, 0], jnp.int32)
        lens = jnp.asarray([32, 0], jnp.int32)
        got_k, got_v = kv_cache_append_chunk(kc, vc, kn, vn, slots, pos, lens)
        np.testing.assert_array_equal(np.asarray(got_k[0]), np.asarray(kc[0]))
        np.testing.assert_array_equal(np.asarray(got_v[0]), np.asarray(vc[0]))
        np.testing.assert_array_equal(
            np.asarray(got_k[1, :, 32:64]), np.asarray(kn[0])
        )
