"""Video facade (reference src/video/mod.rs Video::open).

Opens an MP4 file, locates the video track, exposes stream info (codec,
dimensions, duration, display matrix / rotation) and decodes frames
through the syntax + reconstruction pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .avc import NalUnitType, split_avcc
from .container import MP4File
from .container.atoms import VIDEO_CODECS
from .decoder import DecodedFrame, SyntaxDecoder, group_access_units


@dataclass
class SeekPosition:
    """Seek grammar: '12s' | '1500ms' | '50%' | '1234ts' (reference
    video/mod.rs:131-160)."""
    kind: str = "ts"
    value: float = 0.0

    @classmethod
    def parse(cls, s: str) -> "SeekPosition":
        s = s.strip()
        for suffix, kind in (("ms", "ms"), ("s", "s"), ("%", "pct"),
                             ("ts", "ts")):
            if s.endswith(suffix):
                try:
                    return cls(kind, float(s[:-len(suffix)]))
                except ValueError:
                    break
        return cls("ts", 0.0)


class Video:
    def __init__(self, path):
        self.path = str(path)
        self.mp4 = MP4File(path)
        self.trak = self.mp4.video_track()
        if self.trak is None:
            raise ValueError("no video track")
        mdia = self.trak.mdia
        self.mdhd = mdia.mdhd
        self.minf = mdia.minf(self.mp4.f)
        self.stbl = self.minf.stbl
        entry = self.stbl.stsd.entries[0]
        self.fourcc = entry.fourcc
        self.codec = VIDEO_CODECS.get(entry.fourcc, "UNKNOWN")
        self.avc1 = entry.codec if entry.fourcc == b"avc1" else None

    @classmethod
    def open(cls, path) -> "Video":
        return cls(path)

    # -- info -----------------------------------------------------------
    @property
    def width(self) -> float:
        return self.trak.tkhd.width if self.trak.tkhd else 0

    @property
    def height(self) -> float:
        return self.trak.tkhd.height if self.trak.tkhd else 0

    @property
    def duration_seconds(self) -> float:
        if not self.mdhd or not self.mdhd.timescale:
            return 0.0
        return self.mdhd.duration / self.mdhd.timescale

    @property
    def rotation(self) -> float:
        tkhd = self.trak.tkhd
        return tkhd.matrix.rotation() if tkhd and tkhd.matrix else 0.0

    @property
    def meta_tags(self) -> dict:
        return self.mp4.moov.meta.tags if self.mp4.moov.meta else {}

    def info(self) -> dict:
        return {
            "codec": self.codec,
            "width": self.width,
            "height": self.height,
            "duration_s": self.duration_seconds,
            "rotation": self.rotation,
            "timescale": self.mdhd.timescale if self.mdhd else 0,
            "language": self.mdhd.language if self.mdhd else "und",
        }

    # -- decoding -------------------------------------------------------
    def decode_frames(self, max_frames: int = 1, backend: str = "jax"):
        """Decode the first `max_frames` frames to YUV (reference decodes
        exactly one, decoder.rs:88)."""
        if self.codec != "H264" or self.avc1 is None or self.avc1.avcc is None:
            raise NotImplementedError(f"codec {self.codec}")
        avcc = self.avc1.avcc
        sd = SyntaxDecoder()
        from .avc import NalUnit

        ps_nals = [NalUnit.parse(b) for b in avcc.sps_list + avcc.pps_list]
        sd.feed_parameter_sets(ps_nals)

        slice_nals = []
        for sample in self.mp4.iter_samples(self.stbl):
            for nal in split_avcc(sample, avcc.nal_length_size):
                if nal.type in (NalUnitType.SPS, NalUnitType.PPS):
                    sd.feed_parameter_sets([nal])
                elif nal.type in (NalUnitType.IDR_SLICE,
                                  NalUnitType.NON_IDR_SLICE):
                    slice_nals.append(nal)

        frames = []
        for pic in group_access_units(slice_nals):
            sps, pps, mbs, _ = sd.decode_picture_syntax(pic)
            if backend == "jax":
                from .coeffs import pack_frame
                from .pipeline import reconstruct_frame_jax
                fs = pack_frame(mbs, sps, pps)
                y, cb, cr = reconstruct_frame_jax(fs)
            else:
                from .refimpl.recon import FrameRecon
                recon = FrameRecon(sps, pps)
                for addr, mb in enumerate(mbs):
                    recon.recon_mb(mb, addr, mb.slice_id)
                y, cb, cr = recon.y, recon.cb, recon.cr
            frames.append(DecodedFrame(np.asarray(y), np.asarray(cb),
                                       np.asarray(cr)).crop(sps))
            if max_frames and len(frames) >= max_frames:
                break
        return frames

    def write_yuv(self, path, frame: DecodedFrame):
        """Planar YUV dump, Y then Cb then Cr (reference frame/mod.rs:48)."""
        with open(path, "wb") as f:
            f.write(frame.y.astype(np.uint8).tobytes())
            f.write(frame.cb.astype(np.uint8).tobytes())
            f.write(frame.cr.astype(np.uint8).tobytes())
