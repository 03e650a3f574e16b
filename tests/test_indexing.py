"""Unit tests for the block-index algebra library (composable_kernel_tpu.indexing).

CK analog: test/magic_number_division, test/space_filling_curve,
test/block_to_ctile_map — the index machinery gets direct tests, separate
from the kernels that consume it.
"""

import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu import indexing as ix


class TestClampedBlock:
    def test_clamps_past_live_prefix(self):
        # live_len 200, block 128 -> 2 live blocks (0, 1); kk >= 2 clamps to 1
        assert int(ix.clamped_block(jnp.int32(0), jnp.int32(200), 128)) == 0
        assert int(ix.clamped_block(jnp.int32(1), jnp.int32(200), 128)) == 1
        assert int(ix.clamped_block(jnp.int32(5), jnp.int32(200), 128)) == 1

    def test_zero_len(self):
        assert int(ix.clamped_block(jnp.int32(3), jnp.int32(0), 128)) == 0


class TestFitPackedBlock:
    def test_power_of_two_halves(self):
        # llama ffn 14336: half 7168, target 512 -> 512
        assert ix.fit_packed_block(512, 7168, 128) == 512
        assert ix.fit_packed_block(512, 2048, 128) == 512

    def test_prime_group_count(self):
        # K=11008: half 5504 = 43 * 128 -> only 128 or 5504 divide; target 512
        assert ix.fit_packed_block(512, 5504, 128) == 128
        assert ix.fit_packed_block(6000, 5504, 128) == 5504

    def test_group_larger_than_half(self):
        # group spans the whole half segment -> lane-aligned blocks
        assert ix.fit_packed_block(512, 128, 256) == 128

    def test_small_group(self):
        # g=64: unit 64 but lane alignment forces 128-multiples
        assert ix.fit_packed_block(256, 256, 64) == 256
        assert ix.fit_packed_block(128, 256, 64) == 128

    def test_per_channel(self):
        assert ix.fit_packed_block(512, 2048, None) == 512

    def test_divides(self):
        for half in (128, 384, 5504, 7168, 2048, 1152):
            for tgt in (128, 256, 512, 1024):
                b = ix.fit_packed_block(tgt, half, 128 if half % 128 == 0 else 1)
                assert half % b == 0, (half, tgt, b)


class TestSplitHalves:
    def test_a_block_single_segment(self):
        # K=1024, one segment: half_seg=512 packed rows; bpk=128
        # step kk lo covers [kk*128, ...), hi covers [512 + kk*128, ...)
        for kk in range(4):
            assert int(ix.split_halves_a_block(kk, 128, 512, hi=False)) == kk
            assert int(ix.split_halves_a_block(kk, 128, 512, hi=True)) == kk + 4

    def test_a_block_segmented(self):
        # 2 segments (pack_blocks=2): K=1024 -> half_seg=256 packed rows.
        # steps 0,1 in segment 0; steps 2,3 in segment 1 (base 512).
        bpk, hs = 128, 256
        lo = [int(ix.split_halves_a_block(k, bpk, hs, False)) for k in range(4)]
        hi = [int(ix.split_halves_a_block(k, bpk, hs, True)) for k in range(4)]
        assert lo == [0, 1, 4, 5]
        assert hi == [2, 3, 6, 7]

    def test_scale_starts(self):
        lo, hi = ix.split_halves_scale_starts(4, 128, 256, group_size=128)
        assert lo == [0, 1, 4, 5]
        assert hi == [2, 3, 6, 7]


class TestGroupScaleRows:
    def test_expansion(self):
        idx, srb = ix.group_scale_row_table([0, 4], s_rows=4, sublanes=8)
        assert srb == 8
        assert list(idx[:4]) == [0, 1, 2, 3]
        assert list(idx[8:12]) == [4, 5, 6, 7]


class TestRaggedStepTable:
    def _cover(self, sizes, bm, m=None):
        g = len(sizes)
        m = sum(sizes) if m is None else m
        mp = -(-m // bm) * bm
        n_m_tiles = mp // bm
        tbl = np.asarray(ix.ragged_step_table(
            jnp.asarray(sizes, jnp.int32), n_m_tiles, bm, g, mp))
        covered = np.full(mp, -1)
        for tile, gid, lo, hi in tbl.T:
            for r in range(lo, hi):
                row = tile * bm + r
                assert covered[row] == -1, f"row {row} covered twice"
                covered[row] = gid
        return covered, tbl

    def test_every_row_covered_once_with_right_group(self):
        sizes = [5, 27, 1, 63]
        covered, _ = self._cover(sizes, bm=16)
        offs = np.cumsum([0] + sizes)
        for gi in range(len(sizes)):
            assert (covered[offs[gi]:offs[gi + 1]] == gi).all()

    def test_empty_groups_and_trailing(self):
        sizes = [0, 7, 0, 3]
        covered, _ = self._cover(sizes, bm=8, m=24)
        assert (covered[:7] == 1).all()
        assert (covered[7:10] == 3).all()
        assert (covered[10:] == 3).all()  # trailing rows ride the last group

    def test_steps_sorted_by_tile(self):
        _, tbl = self._cover([5, 27, 1, 63], bm=16)
        tiles = tbl[0]
        live = tbl[2] < tbl[3]
        assert (np.diff(tiles[live]) >= 0).all()
