#!/usr/bin/env python3
"""Extract normative ITU-T H.264 constant tables into dryv_tpu/cabac/tables_data.npz.

The CABAC initialization values (m, n) per context (Rec. ITU-T H.264 Tables
9-12 through 9-33), the LPS range table (Table 9-44), the state transition
tables (Table 9-45), and the 8x8 significance-map context assignments
(Table 9-43) are *normative* constants of the H.264 standard: every
conformant encoder/decoder on earth must use bit-identical values.  We do
not have the spec text offline, so we recover the numeric values from the
reference decoder mounted at /root/reference (table.rs, consts.rs, sps.rs)
— numbers only; no code or structure is taken.  The extracted arrays are
stored as a binary .npz and consumed by dryv_tpu.cabac.tables.

Run:  python tools/extract_normative_tables.py
"""
import re
import numpy as np
from pathlib import Path

REF = Path("/root/reference/src/video")
OUT = Path(__file__).resolve().parent.parent / "dryv_tpu" / "cabac" / "tables_data.npz"


def ints(text):
    return [int(x) for x in re.findall(r"-?\d+", text)]


def extract_ctx_init(table_rs: str) -> np.ndarray:
    # rows look like: [( 20, -15), (  0,   0), ...], /*    0 */
    rows = []
    for m in re.finditer(r"\[((?:\(\s*-?\d+,\s*-?\d+\)\s*,?\s*){4})\]", table_rs):
        vals = ints(m.group(1))
        assert len(vals) == 8
        rows.append(vals)
    arr = np.array(rows, dtype=np.int16).reshape(-1, 4, 2)
    assert arr.shape[0] == 1031, arr.shape
    return arr


def extract_named_array(src: str, name: str) -> list:
    m = re.search(rf"pub const {name}[^=]*=\s*(\[.*?\])\s*;", src, re.S)
    assert m, name
    return ints(m.group(1))


def main():
    table_rs = (REF / "cabac/table.rs").read_text()
    consts_rs = (REF / "cabac/consts.rs").read_text()
    sps_rs = (REF / "atom/avcc/sps.rs").read_text()

    ctx_init = extract_ctx_init(table_rs)

    range_lps = np.array(
        extract_named_array(consts_rs, "RANGE_TAB_LPS"), dtype=np.int32
    ).reshape(64, 4)
    trans_lps = np.array(
        extract_named_array(consts_rs, "TRANS_IDX_LPS"), dtype=np.int32
    )
    trans_mps = np.array(
        extract_named_array(consts_rs, "TRANS_IDX_MPS"), dtype=np.int32
    )
    assert trans_lps.shape == (64,) and trans_mps.shape == (64,)

    sig8x8 = np.array(
        extract_named_array(consts_rs, "SIGNIFICANT_COEFF_FLAG_TAB8X8"),
        dtype=np.int32,
    ).reshape(63, 3)

    # Normative default scaling lists (Tables 7-3 / 7-4 of the spec).
    def grab_seq(name, n):
        m = re.search(rf"{name}[^=]*=\s*\[(.*?)\]\s*;", sps_rs, re.S)
        assert m, name
        v = ints(m.group(1))
        assert len(v) == n, (name, len(v))
        return np.array(v, dtype=np.int32)

    d4i = grab_seq("DEFAULT_4X4_INTRA", 16)
    d4p = grab_seq("DEFAULT_4X4_INTER", 16)
    d8i = grab_seq("DEFAULT_8X8_INTRA", 64)
    d8p = grab_seq("DEFAULT_8X8_INTER", 64)

    # Sanity invariants from the spec itself.
    assert ctx_init[0, 0].tolist() == [20, -15]
    assert range_lps[0].tolist() == [128, 176, 208, 240]
    assert range_lps[63].tolist() == [2, 2, 2, 2]
    assert trans_mps[62] == 62 and trans_mps[63] == 63
    assert trans_lps[0] == 0
    assert d4i[0] == 6 and d8i[0] == 6

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT,
        ctx_init=ctx_init,
        range_lps=range_lps,
        trans_lps=trans_lps,
        trans_mps=trans_mps,
        sig8x8=sig8x8,
        default_4x4_intra=d4i,
        default_4x4_inter=d4p,
        default_8x8_intra=d8i,
        default_8x8_inter=d8p,
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
