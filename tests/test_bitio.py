import random

from dryv_tpu.bitio import (
    BitReader,
    BitWriter,
    insert_emulation_prevention,
    strip_emulation_prevention,
)


def test_bit_roundtrip():
    rng = random.Random(0)
    w = BitWriter()
    vals = []
    for _ in range(1000):
        n = rng.randint(1, 24)
        v = rng.getrandbits(n)
        vals.append((v, n))
        w.bits(v, n)
    w.byte_align()
    r = BitReader(w.bytes())
    for v, n in vals:
        assert r.bits(n) == v


def test_exp_golomb_roundtrip():
    rng = random.Random(1)
    w = BitWriter()
    ue_vals = [rng.randint(0, 100000) for _ in range(500)]
    se_vals = [rng.randint(-5000, 5000) for _ in range(500)]
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    w.byte_align()
    r = BitReader(w.bytes())
    for v in ue_vals:
        assert r.ue() == v
    for v in se_vals:
        assert r.se() == v


def test_exp_golomb_known_values():
    # spec 9.1 Table 9-1: 0->'1', 1->'010', 2->'011', 3->'00100'
    w = BitWriter()
    for v in [0, 1, 2, 3, 4, 5, 6, 7]:
        w.ue(v)
    w.byte_align()
    r = BitReader(w.bytes())
    assert r.bits(1) == 0b1
    assert r.bits(3) == 0b010
    assert r.bits(3) == 0b011
    assert r.bits(5) == 0b00100


def test_emulation_prevention_roundtrip():
    rng = random.Random(2)
    for _ in range(50):
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(rng.randint(0, 64)))
        protected = insert_emulation_prevention(raw)
        # no 00 00 0x (x<=3) pattern may remain
        for i in range(len(protected) - 2):
            if protected[i] == 0 and protected[i + 1] == 0:
                assert protected[i + 2] > 3 or protected[i + 2] == 3
                if protected[i + 2] == 3:
                    continue
        assert strip_emulation_prevention(protected) == raw


def test_more_rbsp_data():
    w = BitWriter()
    w.ue(7)
    w.rbsp_trailing_bits()
    r = BitReader(w.bytes())
    assert r.more_rbsp_data()
    r.ue()
    assert not r.more_rbsp_data()
