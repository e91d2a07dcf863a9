"""Encoder↔decoder round-trip for the CABAC arithmetic core.

The encoder exists only for fixture generation, but round-tripping random
bin sequences through both engines pins down the spec arithmetic (9.3.3/9.3.4)
on both sides simultaneously: any deviation desynchronizes instantly.
"""
import random

from dryv_tpu.cabac import CabacDecoder, CabacEncoder
from dryv_tpu.cabac.tables import CTX_COUNT, init_context_states


def bits_to_bytes(bits):
    ba = bytearray()
    for i in range(0, len(bits), 8):
        chunk = bits[i:i + 8]
        b = 0
        for j, v in enumerate(chunk):
            b |= v << (7 - j)
        ba.append(b)
    return bytes(ba)


def roundtrip(seed, n_ops, qp, init_mode):
    rng = random.Random(seed)
    ops = []
    for _ in range(n_ops):
        r = rng.random()
        if r < 0.6:
            ops.append(("d", rng.randrange(0, 276), rng.randint(0, 1)))
        elif r < 0.9:
            ops.append(("b", rng.randint(0, 1)))
        else:
            ops.append(("t", 0))
    ops.append(("t", 1))

    enc = CabacEncoder(qp, init_mode)
    for op in ops:
        if op[0] == "d":
            enc.decision(op[1], op[2])
        elif op[0] == "b":
            enc.bypass(op[1])
        else:
            enc.terminate(op[1])
    data = bits_to_bytes(enc.get_bits())

    dec = CabacDecoder(data, 0, qp, init_mode)
    for op in ops:
        if op[0] == "d":
            assert dec.decision(op[1]) == op[2]
        elif op[0] == "b":
            assert dec.bypass() == op[1]
        else:
            assert dec.terminate() == op[1]


def test_roundtrip_various():
    for seed in range(10):
        roundtrip(seed, 2000, qp=26, init_mode=0)
    roundtrip(99, 5000, qp=0, init_mode=0)
    roundtrip(98, 5000, qp=51, init_mode=0)
    for mode in (1, 2, 3):
        roundtrip(100 + mode, 3000, qp=30, init_mode=mode)


def test_ueg_roundtrip():
    # UEG0 (coeff_abs_level, uCoff=14) and UEG3 (mvd, uCoff=9, signed)
    rng = random.Random(7)
    vals_ueg0 = [rng.randint(1, 60000) for _ in range(200)]
    vals_ueg3 = [rng.randint(-30000, 30000) for _ in range(200)]

    enc = CabacEncoder(26, 0)
    for v in vals_ueg0:
        # prefix: TU with cMax=14 over dummy ctx 227..
        enc.tu(min(v - 1, 14), 227, [0, 1, 1, 1, 1], 14)
        enc.ueg_suffix(v - 1, 14, 0, False, 0)
    for v in vals_ueg3:
        a = abs(v)
        enc.tu(min(a, 9), 40, [0, 1, 2, 3, 4, 5, 6], 9)
        enc.ueg_suffix(a, 9, 3, True, v)
    enc.terminate(1)
    data = bits_to_bytes(enc.get_bits())

    dec = CabacDecoder(data, 0, 26, 0)
    for v in vals_ueg0:
        prefix = dec.tu(227, [0, 1, 1, 1, 1], 14)
        got = dec.ueg_suffix(prefix, 14, 0, False)
        assert got == v - 1
    for v in vals_ueg3:
        prefix = dec.tu(40, [0, 1, 2, 3, 4, 5, 6], 9)
        got = dec.ueg_suffix(prefix, 9, 3, True)
        assert got == v
    assert dec.terminate() == 1


def test_ctx_init_shapes():
    p, v = init_context_states(26, 0)
    assert p.shape == (CTX_COUNT,) and v.shape == (CTX_COUNT,)
    assert (p >= 0).all() and (p <= 63).all()
