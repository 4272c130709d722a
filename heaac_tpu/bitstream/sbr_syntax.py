"""SBR (Spectral Band Replication) bitstream parsing.

Round-1 stub: payloads are skipped so AAC-LC streams containing fill data
decode; full SBR (reference libavcodec/aacsbr.c) lands with the HE-AAC v1
milestone.
"""
from __future__ import annotations


def decode_sbr_extension(dec, br, che, crc: bool, cnt: int,
                         elem_type_prev: int) -> int:
    """Skip the SBR payload; returns bytes consumed (aacsbr.c:1044)."""
    br.skip(8 * cnt - 4)
    return cnt
