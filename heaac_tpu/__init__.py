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


def decode_m4a(data: bytes):
    """Decode an MP4/M4A file's AAC track -> (pcm int16 [samples,
    channels], rate).  The container path the reference serves with
    libavformat/mov.c: esds -> ASC extradata, sample tables -> packets.
    ADTS-representable tracks re-wrap and ride the batched ADTS fast
    path; explicit-signaling/PCE tracks decode via the ASC-configured
    Decoder."""
    from .io.mp4 import Mp4Error, demux_m4a, m4a_to_adts

    try:
        return decode_adts(m4a_to_adts(data))
    except Mp4Error:
        pass
    t = demux_m4a(data)
    dec = Decoder(asc=t.asc)
    import numpy as np
    chunks = []
    for f in t.frames:
        try:
            chunks.append(dec.decode_frame(f))
        except Exception:
            dec.error_count += 1
    pcm = (np.concatenate(chunks, axis=0) if chunks
           else np.zeros((0, 1), np.int16))
    # Decoder.sample_rate is the OUTPUT rate once a frame has decoded
    # (SBR doubling applied in _spectral_to_sample)
    return pcm, dec.sample_rate


def decode(data: bytes):
    """Format-sniffing front door: ADTS or MP4/M4A bytes in, (pcm,
    rate) out (the av_read_frame + decode loop analogue)."""
    from .io.mp4 import probe_m4a

    if probe_m4a(data):
        return decode_m4a(data)
    return decode_adts(data)


__all__ = ["Decoder", "decode", "decode_adts", "decode_m4a"]
__version__ = "0.1.0"
