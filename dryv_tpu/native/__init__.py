"""Native (C++) host components: the CABAC entropy hot path.

Built on demand with g++ (`python -m dryv_tpu.native.build` or implicitly on
first import of dryv_tpu.native.entropy).
"""
