"""Parametric Stereo bitstream parsing (reference libavcodec/aacps.c:84-252).

Round-1 stub: payload is skipped; full PS lands with the HE-AAC v2 milestone.
"""
from __future__ import annotations


class PSContext:
    def __init__(self):
        self.start = 0


def read_ps_data(ps: PSContext, br, bits_left: int) -> int:
    br.skip(bits_left)
    return bits_left
