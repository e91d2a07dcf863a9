"""Batch-pipelined intra GOP decode: the production e2e path.

Per batch of F pictures: the C++ slice-parallel entropy stage fills a
preallocated compact host buffer (uint8/int16 ABI, one slot per frame,
copied straight out of the reusable entropy arena), the whole batch
ships to the device in one transfer, and ONE launch of the Pallas
mega-kernel (+ the Pallas deblock kernel when the stream enables the
in-loop filter) reconstructs all F frames.  Dispatch is asynchronous:
while the device reconstructs batch k, the host entropy-decodes batch
k+1 — the steady-state throughput bench.py measures is this overlap
with per-batch pack + host->device transfer paid inside the loop.

The upstream reference decodes one frame, single-threaded, CPU-only
(/root/reference/src/video/decoder.rs:88 `.take(1)`); this module is the
scale-out replacement for its decode_sample loop.
"""
from __future__ import annotations

import numpy as np

from .coeffs import KIND_PCM
from .pipeline import SYNTAX_KEYS  # noqa: F401  (re-export convenience)

COMPACT_I16 = ("luma_lv", "luma_dc", "chroma_dc", "chroma_ac")
COMPACT_U8 = ("kind", "qp_y", "qp_cb", "qp_cr", "i16_mode", "chroma_mode",
              "modes4", "modes8")


def _qpc_vec(qp, off):
    from .refimpl.transform import QPC_TAB
    qpi = np.clip(qp + off, 0, 51)
    return np.where(qpi < 30, qpi, QPC_TAB[np.clip(qpi - 30, 0, 21)])


def alloc_compact(F: int, n: int) -> dict:
    """Preallocate one batch worth of compact host buffers."""
    return {
        "kind": np.zeros((F, n), np.uint8),
        "qp_y": np.zeros((F, n), np.uint8),
        "qp_cb": np.zeros((F, n), np.uint8),
        "qp_cr": np.zeros((F, n), np.uint8),
        "i16_mode": np.zeros((F, n), np.uint8),
        "chroma_mode": np.zeros((F, n), np.uint8),
        "modes4": np.zeros((F, n, 16), np.uint8),
        "modes8": np.zeros((F, n, 4), np.uint8),
        "avail_a": np.zeros((F, n), np.bool_),
        "avail_b": np.zeros((F, n), np.bool_),
        "avail_c": np.zeros((F, n), np.bool_),
        "avail_d": np.zeros((F, n), np.bool_),
        "luma_lv": np.zeros((F, n, 256), np.int16),
        "luma_dc": np.zeros((F, n, 16), np.int16),
        "chroma_dc": np.zeros((F, n, 8), np.int16),
        "chroma_ac": np.zeros((F, n, 128), np.int16),
    }


def fill_compact_slot(buf: dict, i: int, out: dict, pps, mb_w: int,
                      mb_h: int) -> bool:
    """Copy one picture's native entropy outputs into batch slot i.

    Copies immediately (the entropy arena is reused by the next decode).
    Returns True if the picture contains PCM macroblocks (caller adds
    pcm buffers lazily — x264 output virtually never trips this)."""
    n = mb_w * mb_h
    kind = out["kind"]
    buf["kind"][i] = kind
    qp_y = out["qp_y"]
    buf["qp_y"][i] = qp_y
    off1 = pps.second_chroma_qp_offset
    buf["qp_cb"][i] = _qpc_vec(qp_y, pps.chroma_qp_index_offset)
    buf["qp_cr"][i] = _qpc_vec(qp_y, off1)
    buf["i16_mode"][i] = out["i16_mode"]
    buf["chroma_mode"][i] = out["chroma_mode"]
    buf["modes4"][i] = out["modes4"]
    buf["modes8"][i] = out["modes8"]
    i8 = (kind == 1)[:, None]
    np.copyto(buf["luma_lv"][i],
              np.where(i8, out["luma8"].reshape(n, 256),
                       out["luma4"].reshape(n, 256)), casting="unsafe")
    np.copyto(buf["luma_dc"][i], out["luma_dc"].reshape(n, 16),
              casting="unsafe")
    np.copyto(buf["chroma_dc"][i],
              np.ascontiguousarray(out["chroma_dc"][:, :, :4]).reshape(n, 8),
              casting="unsafe")
    np.copyto(buf["chroma_ac"][i],
              np.ascontiguousarray(out["chroma_ac"][:, :, :4, :])
              .reshape(n, 128), casting="unsafe")
    # slice-aware availability
    sid = out["slice_id"].astype(np.int64).reshape(mb_h, mb_w)
    nb = np.full((mb_h, mb_w), -9, np.int64)
    nb[:, 1:] = sid[:, :-1]
    buf["avail_a"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, :] = sid[:-1, :]
    buf["avail_b"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, :-1] = sid[:-1, 1:]
    buf["avail_c"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, 1:] = sid[:-1, :-1]
    buf["avail_d"][i] = (nb == sid).reshape(-1)
    has_pcm = bool((kind == KIND_PCM).any())
    if has_pcm:
        if "pcm_y" not in buf:
            F = buf["kind"].shape[0]
            buf["pcm_y"] = np.zeros((F, n, 16, 16), np.uint8)
            buf["pcm_c"] = np.zeros((F, n, 2, 8, 8), np.uint8)
        np.copyto(buf["pcm_y"][i], out["pcm_y"].reshape(n, 16, 16),
                  casting="unsafe")
        np.copyto(buf["pcm_c"][i], out["pcm_c"].reshape(n, 2, 8, 8),
                  casting="unsafe")
    return has_pcm


def _parse_pictures(stream: bytes):
    from .avc import split_annexb
    from .avc.slice_header import SliceHeader
    from .decoder import SyntaxDecoder, group_access_units

    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pics = []
    sps = pps = None
    # single parameter-set streams (the common case) parse each slice
    # header once; multi-PPS streams probe with an arbitrary set first
    # to learn the pic_parameter_set_id, then re-parse with the right one
    single = len(sd.pps_map) == 1 and len(sd.sps_map) == 1
    for pic_nals in group_access_units(rest):
        headers = []
        slice_datas = []
        for nal in pic_nals:
            rbsp = nal.rbsp
            probe_pps = next(iter(sd.pps_map.values()))
            probe_sps = next(iter(sd.sps_map.values()))
            h0 = SliceHeader.parse(rbsp, nal, probe_sps, probe_pps)
            pps = sd.pps_map[h0.pic_parameter_set_id]
            sps = sd.sps_map[pps.seq_parameter_set_id]
            h = h0 if single else SliceHeader.parse(rbsp, nal, sps, pps)
            headers.append(h)
            bitoff = ((h.header_bit_len + 7) & ~7
                      if pps.entropy_coding_mode_flag else h.header_bit_len)
            slice_datas.append((rbsp, bitoff, h.first_mb_in_slice,
                                h.slice_qp_y(pps)))
        pics.append((slice_datas, headers))
    return pics, sps, pps


def _gop_supported(sps, pps, headers) -> bool:
    h = headers[0]
    return (h.slice_type.is_intra and sps.chroma_array_type == 1
            and not h.field_pic_flag
            and not sps.qpprime_y_zero_transform_bypass_flag
            and not sps.bit_depth_luma_minus8
            and pps.slice_groups is None
            and pps.entropy_coding_mode_flag
            and not sps.seq_scaling_matrix_present_flag
            and not pps.pic_scaling_matrix_present_flag)


# ---------------------------------------------------------------------------
# packed host->device ABI: ONE int16 buffer + ONE uint8 buffer per batch.
#
# A remote TPU (the dev rig tunnels the device over a network link) pays a
# large fixed cost per transfer: shipping the compact dict as 16-32
# individual arrays costs ~115 ms/frame where the raw bytes need ~13 ms.
# Packing everything into two contiguous buffers makes the transfer
# bandwidth-bound, and moving the derived quantities (qp_cb/qp_cr, the
# slice-availability masks, the deblock edge parameters) onto the device
# removes another ~120 ms/frame of host precompute + transfer.
# ---------------------------------------------------------------------------

I16_STRIDE = 408    # luma_lv 256 | luma_dc 16 | chroma_dc 8 | chroma_ac 128
U8_STRIDE = 19      # kind qp_y i16_mode chroma_mode | modes4 8 (nibbles)
                    # | modes8 2 (nibbles) | sid_lo sid_hi
                    # | dis offa+12 offb+12   (entropy.cc kMetaStride)


def alloc_packed(F: int, n: int):
    return (np.zeros((F, n, I16_STRIDE), np.int16),
            np.zeros((F, n, U8_STRIDE), np.uint8))


# --- single-blob staging ----------------------------------------------------
# All seven wire arrays live in ONE contiguous uint8 blob per batch: the
# host ships a single jnp.asarray (one transfer-stream object instead of
# seven, ~30% less enqueue serialization on the tunneled device) and the
# jitted program slices + bitcasts the segments back out (free layout ops
# on device).

_BLOB_SPEC = (("bmp", np.uint8, lambda F, npad, n, W, e, o: (F, npad, 51)),
              ("vals", np.int8, lambda F, npad, n, W, e, o: (F, npad, W)),
              ("exc_idx", np.int32, lambda F, npad, n, W, e, o: (F, e)),
              ("exc_delta", np.int16, lambda F, npad, n, W, e, o: (F, e)),
              ("ovf_idx", np.int32, lambda F, npad, n, W, e, o: (F, o)),
              ("ovf_rows", np.int16,
               lambda F, npad, n, W, e, o: (F, o, I16_STRIDE)),
              ("u8", np.uint8, lambda F, npad, n, W, e, o: (F, n, U8_STRIDE)))


def _blob_layout(F, npad, n, W, ecap, ovcap):
    offs = {}
    t = 0
    for name, dt, shape_of in _BLOB_SPEC:
        t = (t + 63) & ~63
        shape = shape_of(F, npad, n, W, ecap, ovcap)
        offs[name] = (t, shape, dt)
        t += int(np.prod(shape)) * np.dtype(dt).itemsize
    return offs, t


def _alloc_blob(F, npad, n, W, ecap, ovcap):
    offs, total = _blob_layout(F, npad, n, W, ecap, ovcap)
    blob = np.zeros(total, np.uint8)
    views = {name: np.ndarray(shape, dt, buffer=blob, offset=off)
             for name, (off, shape, dt) in offs.items()}
    views["ovf_idx"][:] = npad
    return blob, views


_SPLITTER_CACHE: dict = {}


def _make_blob_splitter(F, npad, n, W, ecap, ovcap):
    """Returns split(blob) -> the 7 wire arrays, implemented as SEVEN
    single-segment jitted programs (slice + bitcast).  One program per
    segment is deliberate: a single program with several large u8
    slices at different offsets sends the XLA TPU compiler into a
    multi-minute layout pass at 1080p sizes, while each single-slice
    program compiles in under a second and the extra dispatches are
    ~10 us each."""
    key = (F, npad, n, W, ecap, ovcap)
    fn = _SPLITTER_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp
    offs, _total = _blob_layout(F, npad, n, W, ecap, ovcap)
    jdt = {np.dtype(np.uint8): jnp.uint8, np.dtype(np.int8): jnp.int8,
           np.dtype(np.int16): jnp.int16, np.dtype(np.int32): jnp.int32}

    def seg_fn(name):
        off, shape, dt = offs[name]
        dt = np.dtype(dt)
        nb = int(np.prod(shape)) * dt.itemsize
        jd = jdt[dt]

        def one(blob):
            x = blob[off:off + nb]
            if dt.itemsize == 1:
                y = (x if jd == jnp.uint8
                     else jax.lax.bitcast_convert_type(x, jd))
            else:
                y = jax.lax.bitcast_convert_type(
                    x.reshape(-1, dt.itemsize), jd)
            return y.reshape(shape)

        return jax.jit(one)

    fns = [seg_fn(name) for name, _dt, _shape_of in _BLOB_SPEC]

    def split(blob):
        return tuple(f(blob) for f in fns)

    fn = _SPLITTER_CACHE[key] = split
    return fn


# --- bitmap coefficient encoding -------------------------------------------
#
# The dense [F, n, 408] int16 coefficient buffer is ~97% zeros on typical
# streams; over a low-bandwidth link (the dev rig's tunneled TPU moves
# ~0.2 GB/s and does not compress) shipping it raw costs more than the
# entropy decode itself.  Encode instead as:
#   bmp  u8 [F, npad, 51]  per-MB nonzero bitmap (bit c of the 408-row at
#                          byte c>>3, bit c&7)
#   vals i8 [F, npad, 32]  per-MB nonzero values in row order, +/-127 clip;
#                          the stride is FIXED at 32 — an MB with more
#                          nonzeros ships its whole dense 408-coeff int16
#                          row via the overflow channel instead
#   exc_idx i32 / exc_delta i16 [F, ecap]   rare |v|>127 corrections
#   ovf_idx i32 [F, ovcap] / ovf_rows i16 [F, ovcap, 408]   heavy MBs
# = ~1 MB/frame at QP30 vs 6.7 dense.  The C++ entropy stage emits these
# directly (native dt_pack_frame); the device rebuilds the dense rows with
# the gather-free Pallas kernel in kernels/densify.py plus one vmap'd
# row scatter for the overflow MBs.

def _round_cap(x, q):
    return max(q, (int(x) + q - 1) & ~(q - 1))


def _make_packed_gop_fn(mb_w: int, mb_h: int, F: int, deblocked: bool,
                        chroma_off0: int, chroma_off1: int, W: int,
                        ecap: int, ovcap: int, interpret=None):
    """jit((bmp, vals, exc_idx, exc_delta, ovf_idx, ovf_rows, u8meta,
    ls4y, ls4cb, ls4cr, ls8y)) -> (y, cb, cr) uint8 [F,H,W] planes.
    The inputs come from _make_blob_splitter's device-side unpacking of
    the single staged transfer blob.  Coefficient densify (Pallas,
    kernels/densify.py), heavy-MB overflow row scatter, derived syntax
    (qp_c, slice availability), and the deblock edge parameters are all
    computed on device; the host ships ~1.3 MB/frame in ONE transfer."""
    import jax
    import jax.numpy as jnp

    from .kernels.deblock import deblock_precompute_intra_jax
    from .kernels.densify import BLK, make_densify, round_up
    from .kernels.pallas_deblock import make_gop_pipeline_deblock_pallas
    from .kernels.pallas_wavefront import make_gop_pipeline_pallas
    from .refimpl.transform import QPC_TAB

    n = mb_w * mb_h
    npad = round_up(n, BLK)
    qpc_tab = jnp.asarray(QPC_TAB, jnp.int32)
    densify = make_densify(F, npad, W, interpret=interpret)
    if deblocked:
        inner = make_gop_pipeline_deblock_pallas(mb_w, mb_h, F,
                                                 has_pcm=False,
                                                 interpret=interpret)
    else:
        inner = make_gop_pipeline_pallas(mb_w, mb_h, F, has_pcm=False,
                                         interpret=interpret)

    def qpc_vec(qp, off):
        qpi = jnp.clip(qp + off, 0, 51)
        return jnp.where(qpi < 30, qpi, qpc_tab[jnp.clip(qpi - 30, 0, 21)])

    def run(bmp, vals, exc_idx, exc_delta, ovf_idx, ovf_rows, u8,
            ls4y, ls4cb, ls4cr, ls8y):
        dense = densify(bmp, vals)                 # [F, npad, 408] i16
        flat = dense.reshape(F, npad * I16_STRIDE)

        def fix_one(d_f, ei_f, ed_f):
            return d_f.at[ei_f].add(ed_f)   # |v|>127 corrections (pad: +0@0)

        flat = jax.vmap(fix_one)(flat, exc_idx, exc_delta)
        dense = flat.reshape(F, npad, I16_STRIDE)

        def ovf_one(d_f, oi_f, orow_f):
            # heavy MBs (> W nonzeros) ship whole dense rows; pad slots
            # carry index npad (out of range -> dropped)
            return d_f.at[oi_f].set(orow_f, mode="drop")

        dense = jax.vmap(ovf_one)(dense, ovf_idx, ovf_rows)
        i16 = dense[:, :n]
        qp_y = u8[:, :, 1].astype(jnp.int32)
        sid = (u8[:, :, 14].astype(jnp.int32)
               | (u8[:, :, 15].astype(jnp.int32) << 8))
        sid2 = sid.reshape(F, mb_h, mb_w)
        # shifted-neighbor slice-id grids (-9 = outside the picture):
        # a neighbor is available iff it exists and shares the slice
        neg = jnp.full((F, mb_h, mb_w), -9, jnp.int32)
        nb_a = neg.at[:, :, 1:].set(sid2[:, :, :-1])
        nb_b = neg.at[:, 1:, :].set(sid2[:, :-1, :])
        nb_c = neg.at[:, 1:, :-1].set(sid2[:, :-1, 1:])
        nb_d = neg.at[:, 1:, 1:].set(sid2[:, :-1, :-1])

        # nibble-packed intra modes -> [F, n, 16] / [F, n, 4]
        m4n = u8[:, :, 4:12]
        modes4 = jnp.stack([m4n & 0xF, m4n >> 4], axis=-1).reshape(F, n, 16)
        m8n = u8[:, :, 12:14]
        modes8 = jnp.stack([m8n & 0xF, m8n >> 4], axis=-1).reshape(F, n, 4)

        s = {
            "kind": u8[:, :, 0],
            "qp_y": u8[:, :, 1],
            "qp_cb": qpc_vec(qp_y, chroma_off0),
            "qp_cr": qpc_vec(qp_y, chroma_off1),
            "i16_mode": u8[:, :, 2],
            "chroma_mode": u8[:, :, 3],
            "modes4": modes4,
            "modes8": modes8,
            "avail_a": (nb_a == sid2).reshape(F, n),
            "avail_b": (nb_b == sid2).reshape(F, n),
            "avail_c": (nb_c == sid2).reshape(F, n),
            "avail_d": (nb_d == sid2).reshape(F, n),
            "luma_lv": i16[:, :, :256],
            "luma_dc": i16[:, :, 256:272],
            "chroma_dc": i16[:, :, 272:280],
            "chroma_ac": i16[:, :, 280:408],
        }
        if not deblocked:
            return inner.__wrapped__(s, ls4y, ls4cb, ls4cr, ls8y)
        dis = u8[:, :, 16].astype(jnp.int32)
        offa = u8[:, :, 17].astype(jnp.int32) - 12
        offb = u8[:, :, 18].astype(jnp.int32) - 12
        pre = jax.vmap(
            lambda k, q, si, d, oa, ob: deblock_precompute_intra_jax(
                k, q, si, d, oa, ob, mb_w, mb_h, chroma_off0, chroma_off1)
        )(s["kind"], qp_y, sid, dis, offa, offb)
        return inner.__wrapped__(s, ls4y, ls4cb, ls4cr, ls8y, pre)

    return jax.jit(run)


_PACKED_FN_CACHE: dict = {}


def make_packed_gop_fn(mb_w, mb_h, F, deblocked, c0, c1, W, ecap, ovcap,
                       interpret=None):
    key = (mb_w, mb_h, F, deblocked, c0, c1, W, ecap, ovcap, interpret)
    fn = _PACKED_FN_CACHE.get(key)
    if fn is None:
        fn = _PACKED_FN_CACHE[key] = _make_packed_gop_fn(
            mb_w, mb_h, F, deblocked, c0, c1, W, ecap, ovcap, interpret)
    return fn


_SPLIT_FN_CACHE: dict = {}


def _split_gop(r, F):
    """Split stacked [F, H, W] planes into per-frame views with ONE
    device dispatch (per-frame eager slicing costs a round trip each on
    a remote device)."""
    import jax
    fn = _SPLIT_FN_CACHE.get(F)
    if fn is None:
        def split(y, cb, cr):
            return ([y[i] for i in range(F)], [cb[i] for i in range(F)],
                    [cr[i] for i in range(F)])
        fn = _SPLIT_FN_CACHE[F] = jax.jit(split)
    return fn(*r)


def decode_annexb_gop_pipelined(stream: bytes, gop: int = 16,
                                n_threads: int = 0, device_out: bool = False,
                                stacked_out: bool = False,
                                interpret=None, timers=None):
    """Decode an Annex-B all-intra stream with the batched device pipeline.

    Steady state per batch of `gop` pictures: the C++ slice-parallel
    entropy stage fills one packed bitmap + one packed uint8 host buffer
    (double-buffered), the main thread enqueues them to the device in
    one shot (jax device transfers are asynchronous: the enqueue costs
    ~1 ms/frame of serialization and the wire transfer overlaps the next
    batch's entropy decode), and one jitted program unpacks, derives
    qp_c/availability/deblock-edge parameters, and runs the whole-GOP
    Pallas wavefront (+ Pallas deblock).  Everything runs on the main
    thread: a round-4 profile showed a background ship thread fighting
    the two entropy worker threads for this host's 2 cores (and the GIL),
    inflating entropy from ~21 to ~45-74 ms/frame; the synchronous
    enqueue design is ~3.5x faster end-to-end on the same rig.

    Returns a list of DecodedFrame (host planes); with device_out=True,
    a list of per-frame (y, cb, cr) device arrays (uncropped); with
    stacked_out=True, a list of per-batch (y, cb, cr, n_frames) stacked
    [F, H, W] device arrays — the natural layout for TPU-resident
    consumers (no per-frame split dispatches).  Streams outside the
    batched scope (inter, non-4:2:0, lossless, FMO, CAVLC, custom
    scaling matrices) fall back to the per-picture paths."""
    import jax.numpy as jnp

    from .decoder import DecodedFrame
    from .kernels.densify import BLK, round_up
    from .kernels.transform import LS4_FLAT, LS8_FLAT
    from .native.entropy import decode_pack_picture_islices
    from .utils.obs import StageTimers

    tm = timers if timers is not None else StageTimers()
    with tm.stage("parse"):
        pics, sps, pps = _parse_pictures(stream)
    if not pics or not all(_gop_supported(sps, pps, h) for _, h in pics):
        from .pipeline import decode_annexb_fast
        assert not (device_out or stacked_out), \
            "device_out requires the batched scope"
        return decode_annexb_fast(stream, n_threads=n_threads)

    mb_w, mb_h = sps.pic_width_in_mbs, sps.frame_height_in_mbs
    n = mb_w * mb_h
    npad = round_up(n, BLK)
    F = gop
    deblocked = any(h.deblocking is None or h.deblocking.disable_idc != 1
                    for _, hs in pics for h in hs)
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]
    c0 = pps.chroma_qp_index_offset
    c1 = pps.second_chroma_qp_offset

    results = []
    pending = None

    def harvest(p):
        (y, cb, cr), nf = p
        if stacked_out:
            results.append((y, cb, cr, nf))
        elif device_out:
            results.extend(list(zip(y[:nf], cb[:nf], cr[:nf])))
        else:
            ys = np.asarray(y)
            cbs = np.asarray(cb)
            crs = np.asarray(cr)
            for i in range(nf):
                results.append(DecodedFrame(ys[i], cbs[i], crs[i])
                               .crop(sps))

    def run_batch(arrs, W_, ecap_, ovcap_):
        fn = make_packed_gop_fn(mb_w, mb_h, F, deblocked, c0, c1,
                                W_, ecap_, ovcap_, interpret)
        parts = _make_blob_splitter(F, npad, n, W_, ecap_, ovcap_)(arrs)
        r = fn(*parts, *ls)
        if device_out and not stacked_out:
            return _split_gop(r, F)
        return r

    # double-buffered host staging; the C++ pack stage (native
    # dt_pack_frame) fills the slots straight from the entropy arena —
    # no numpy rescan on the hot path.  The vals stride W starts at 32
    # and grows (sticky, like the exc/ovf caps) when the stream is dense
    # enough that the 816-byte-per-MB overflow channel would dominate
    # the wire: at QP30 1080p the mean is ~74 nonzeros/MB, so a fixed
    # W=32 ships ~7 MB/frame where W=96 ships ~1.3 MB/frame.
    W = 32
    ecap = 256
    ovcap = 64
    bufs = []
    for _ in range(2):
        blob, views = _alloc_blob(F, npad, n, W, ecap, ovcap)
        views["cnt"] = np.zeros((F, npad), np.int32)
        views["_blob"] = blob
        bufs.append(views)

    def _grow(newW, newE, newO):
        nonlocal W, ecap, ovcap
        for k in range(2):
            old = bufs[k]
            blob, nv = _alloc_blob(F, npad, n, newW, newE, newO)
            nv["bmp"][:] = old["bmp"]
            nv["vals"][:, :, :W] = old["vals"]
            nv["exc_idx"][:, :ecap] = old["exc_idx"]
            nv["exc_delta"][:, :ecap] = old["exc_delta"]
            nv["ovf_idx"][:, :ovcap] = old["ovf_idx"]
            nv["ovf_rows"][:, :ovcap] = old["ovf_rows"]
            nv["u8"][:] = old["u8"]
            nv["cnt"] = old["cnt"]
            nv["_blob"] = blob
            bufs[k] = nv
        W, ecap, ovcap = newW, newE, newO

    def dbctl_of(headers):
        return np.asarray([(1, 0, 0) if h.deblocking is not None
                           and h.deblocking.disable_idc == 1 else
                           (0, 0, 0) if h.deblocking is None else
                           (h.deblocking.disable_idc,
                            h.deblocking.alpha_c0_offset_div2 * 2,
                            h.deblocking.beta_offset_div2 * 2)
                           for h in headers], np.int32)

    batches = [pics[b0:b0 + F] for b0 in range(0, len(pics), F)]
    cur = 0
    for batch in batches:
        b = bufs[cur]
        has_pcm = False
        for i, (slice_datas, headers) in enumerate(batch):
            with tm.stage("prep"):
                ctl = dbctl_of(headers)
                b["exc_idx"][i] = 0
                b["exc_delta"][i] = 0
                b["ovf_idx"][i] = npad
            # fused: slice workers pack their MB ranges cache-hot
            with tm.stage("entropy"):
                out, maxnz, nexc, novf = decode_pack_picture_islices(
                    slice_datas, sps, pps, W, ctl, b["bmp"][i],
                    b["vals"][i], b["cnt"][i], b["u8"][i],
                    b["exc_idx"][i], b["exc_delta"][i],
                    b["ovf_idx"][i], b["ovf_rows"][i],
                    n_threads=n_threads, reuse=True)
            tm.count("frames", 1)
            tm.count("bins", int(out["bin_count"].sum()))
            # rare growth retries re-pack from the arena (no
            # re-decode): sticky caps, typically one growth per
            # stream on the first picture
            while maxnz >= 0 and (nexc > ecap or novf > ovcap
                                  or (maxnz > W and W < 256
                                      and novf * 816 > npad * 32)):
                if maxnz > W and W < 256 and novf * 816 > npad * 32:
                    # dense stream (low QP / high detail): most MBs
                    # exceed the vals stride and would ship 816-byte
                    # dense overflow rows (~7 MB/frame at QP30 1080p —
                    # the round-4 wire cliff).  Grow the sticky stride
                    # to the true per-MB max instead; earlier slots of
                    # this batch stay valid (their vals rows are
                    # zero-extended, their heavy MBs already ride the
                    # overflow channel).
                    _grow(min(_round_cap(maxnz, 32), 256), ecap, ovcap)
                elif nexc > ecap:
                    _grow(W, _round_cap(nexc, 256), ovcap)
                elif novf > ovcap:
                    _grow(W, ecap, _round_cap(novf, 64))
                b = bufs[cur]
                b["exc_idx"][i] = 0
                b["exc_delta"][i] = 0
                b["ovf_idx"][i] = npad
                # the fused 4:2:0 path never fills the dense arena, so a
                # growth retry re-decodes the picture (sticky caps: once
                # per stream, typically on the first picture)
                with tm.stage("pack"):
                    out, maxnz, nexc, novf = decode_pack_picture_islices(
                        slice_datas, sps, pps, W, ctl, b["bmp"][i],
                        b["vals"][i], b["cnt"][i], b["u8"][i],
                        b["exc_idx"][i], b["exc_delta"][i],
                        b["ovf_idx"][i], b["ovf_rows"][i],
                        n_threads=n_threads, reuse=True)
            if maxnz < 0:
                has_pcm = True
                break
        if has_pcm:
            # PCM payloads ride the legacy per-batch path (x264 never
            # emits PCM; this keeps the hot ABI lean)
            r = _decode_batch_legacy(batch, sps, pps, mb_w, mb_h, F,
                                     deblocked, n_threads, interpret, ls)
            if pending is not None:
                with tm.stage("harvest"):
                    harvest(pending)
            pending = (_split_gop(r, F) if device_out and not stacked_out
                       else r, len(batch))
            continue
        # pad the tail batch by replicating the last picture's slot
        with tm.stage("pad"):
            last = len(batch) - 1
            for i in range(len(batch), F):
                for k in ("bmp", "cnt", "u8", "vals", "exc_idx",
                          "exc_delta", "ovf_idx", "ovf_rows"):
                    b[k][i] = b[k][last]
        # synchronous enqueue: jnp.asarray serializes into the transfer
        # stream and returns (~1 ms/frame); the wire transfer + device
        # execution overlap the NEXT batch's entropy decode.  The
        # double buffer keeps the host slots stable until the transfer
        # of batch k is guaranteed drained (batch k+2's entropy).
        with tm.stage("ship"):
            arrs = jnp.asarray(b["_blob"])
        with tm.stage("dispatch"):
            r = run_batch(arrs, W, ecap, ovcap)
        if pending is not None:
            with tm.stage("harvest"):
                harvest(pending)
        pending = (r, len(batch))
        cur ^= 1
    if pending is not None:
        with tm.stage("harvest"):
            harvest(pending)
    return results


def _decode_batch_legacy(batch, sps, pps, mb_w, mb_h, F, deblocked,
                         n_threads, interpret, ls):
    """Unpacked compact-dict batch decode (PCM-capable, synchronous)."""
    import jax.numpy as jnp

    from .kernels.deblock import deblock_precompute_intra, PRE_KEYS
    from .kernels.pallas_deblock import make_gop_pipeline_deblock_pallas
    from .kernels.pallas_wavefront import make_gop_pipeline_pallas
    from .native.entropy import decode_picture_islices

    n = mb_w * mb_h
    off1 = pps.second_chroma_qp_offset
    buf = alloc_compact(F, n)
    pre_list = []
    has_pcm = False
    for i, (slice_datas, headers) in enumerate(batch):
        out = decode_picture_islices(slice_datas, sps, pps,
                                     n_threads=n_threads, reuse=True)
        has_pcm |= fill_compact_slot(buf, i, out, pps, mb_w, mb_h)
        if deblocked:
            ctl = [(0, 0, 0) if h.deblocking is None else
                   (h.deblocking.disable_idc,
                    h.deblocking.alpha_c0_offset_div2 * 2,
                    h.deblocking.beta_offset_div2 * 2) for h in headers]
            pre_list.append(deblock_precompute_intra(
                buf["kind"][i], buf["qp_y"][i], out["slice_id"], ctl,
                mb_w, mb_h, pps.chroma_qp_index_offset, off1))
    for i in range(len(batch), F):
        for v in buf.values():
            v[i] = v[len(batch) - 1]
        if deblocked:
            pre_list.append(pre_list[-1])
    stacked = {k: jnp.asarray(v) for k, v in buf.items()}
    if deblocked:
        pre = {k: jnp.asarray(np.stack([p[k] for p in pre_list]))
               for k in PRE_KEYS}
        fn = make_gop_pipeline_deblock_pallas(
            mb_w, mb_h, F, has_pcm=has_pcm, interpret=interpret)
        return fn(stacked, *ls, pre)
    fn = make_gop_pipeline_pallas(mb_w, mb_h, F, has_pcm=has_pcm,
                                  interpret=interpret)
    return fn(stacked, *ls)
