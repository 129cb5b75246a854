"""Native host-side components (C extension; optional).

`from cuburn_tpu.native import fastout` — raises ImportError when the
extension wasn't compiled; callers fall back to PIL/numpy.
"""
