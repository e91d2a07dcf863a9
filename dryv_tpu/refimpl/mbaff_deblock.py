"""MBAFF in-loop deblocking (spec 8.7 with MbaffFrameFlag = 1).

Filtering order is per MB in pair raster order; field macroblocks filter
on field sample rows, and mixed frame/field macroblock edges follow the
8.7.2 special cases (two field-line passes across a mixed horizontal
boundary, doubled vertical span for field-vs-frame left edges).
"""
from __future__ import annotations

import numpy as np


def deblock_mbaff_frame(y, cb, cr, mbs, ms, sps, pps, headers, dpb):
    raise NotImplementedError(
        "MBAFF in-loop deblocking (encode MBAFF streams with deblocking "
        "disabled)")
