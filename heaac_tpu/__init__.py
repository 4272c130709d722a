"""heaac_tpu — a TPU-native HE-AAC (v1/v2) decode framework.

Public contract mirrors the reference decoder (aconverse/ffmpeg-heaac):
ADTS or AudioSpecificConfig-configured AAC in, interleaved int16 PCM out,
bit-matching the reference C decoder to float tolerance.  Architecture:
bitstream parsing and Huffman decode on host; every dense transform (IMDCT,
windowing/overlap-add, QMF filterbanks, SBR HF reconstruction, parametric
stereo) as batched XLA/Pallas graphs.  See SURVEY.md for the design.
"""
from .codec.decoder import Decoder


def decode_adts(data: bytes):
    """Decode an ADTS byte stream -> (pcm int16 [samples, channels], rate)."""
    from .bitstream.adts import probe_adts

    hdr = probe_adts(data)
    if hdr is None:
        raise ValueError("not an ADTS stream")
    dec = Decoder(adts_probe=data[:7])
    pcm = dec.decode(data)
    return pcm, dec.sample_rate


__all__ = ["Decoder", "decode_adts"]
__version__ = "0.1.0"
