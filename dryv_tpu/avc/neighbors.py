"""Macroblock and sub-block neighbor derivation (spec 6.4.9-6.4.12).

Progressive frame coding (no MBAFF interleave): the neighbor of MB (x, y) is
A=(x-1,y), B=(x,y-1), C=(x+1,y-1), D=(x-1,y-1), gated on slice/slice-group
membership (reference slice/mod.rs:576-613).  Sub-block neighbor derivation
returns (in_current_mb, neighbor_mb_delta, neighbor_blk_idx).
"""
from __future__ import annotations

# 4x4 luma blocks use z-scan order within the MB: blkIdx =
# 4*quadrant + sub where quadrant/sub are 2x2 rasters (spec 6.4.3).
# Map blkIdx -> (x, y) in 4x4-block units (0..3, 0..3):
ZSCAN_4X4_POS = []
for _idx in range(16):
    _q, _s = _idx >> 2, _idx & 3
    ZSCAN_4X4_POS.append((((_q & 1) << 1) | (_s & 1), (_q & 2) | ((_s >> 1) & 1)))
POS_TO_ZSCAN = {pos: i for i, pos in enumerate(ZSCAN_4X4_POS)}


def blk4x4_neighbor(blk_idx: int, direction: str):
    """Left ('A') or above ('B') neighbor of a z-scan 4x4 luma block.

    Returns (same_mb: bool, nb_blk_idx: int)."""
    x, y = ZSCAN_4X4_POS[blk_idx]
    if direction == "A":
        if x > 0:
            return True, POS_TO_ZSCAN[(x - 1, y)]
        return False, POS_TO_ZSCAN[(3, y)]
    else:
        if y > 0:
            return True, POS_TO_ZSCAN[(x, y - 1)]
        return False, POS_TO_ZSCAN[(x, 3)]


def blk8x8_neighbor(blk_idx: int, direction: str):
    """8x8 luma blocks are a 2x2 raster: idx = 2*y + x."""
    x, y = blk_idx & 1, blk_idx >> 1
    if direction == "A":
        if x > 0:
            return True, y * 2 + (x - 1)
        return False, y * 2 + 1
    else:
        if y > 0:
            return True, (y - 1) * 2 + x
        return False, 2 + x


def chroma_blk_neighbor(blk_idx: int, direction: str, chroma_array_type: int):
    """Chroma 4x4 blocks form a raster grid: 2x2 (4:2:0) or 2x4 (4:2:2);
    idx = w*y + x with w=2."""
    h = 2 * chroma_array_type  # rows: 2 for 4:2:0, 4 for 4:2:2
    x, y = blk_idx & 1, blk_idx >> 1
    if direction == "A":
        if x > 0:
            return True, y * 2 + (x - 1)
        return False, y * 2 + 1
    else:
        if y > 0:
            return True, (y - 1) * 2 + x
        return False, (h - 1) * 2 + x
