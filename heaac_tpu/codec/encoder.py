"""AAC-LC encoder (secondary capability; reference aacenc.c/aaccoder.c).

A clean-room, psychoacoustics-free encoder producing spec-conformant
AAC-LC: long windows, per-band scalefactor selection targeting a uniform
quantization quality, optimal per-band Huffman codebook choice, section
coding and ADTS packaging.  The analysis MDCT is derived as the exact
adjoint of this framework's (reference-validated) synthesis pipeline, so
encode->decode round trips reconstruct within quantization error.

Where the reference couples its encoder to a 3GPP psy model and trellis
codebook search (aacpsy.c, aaccoder.c) for rate/quality tuning, this
encoder optimizes for simplicity and conformance; quality knob = ``qstep``.
"""
from __future__ import annotations

import functools

import numpy as np

from ..io.adts import mux_adts
from ..io.bitwriter import BitWriter
from ..tables import aac_tables as T

MAX_QUANT = 8191


@functools.cache
def _analysis_matrix() -> np.ndarray:
    """[2048, 1024] float32: windowed forward MDCT matched to the decoder
    synthesis (adjoint of the long-window overlap-add; scale 1/512)."""
    from ..ops.imdct import imdct_half_matrix

    M = imdct_half_matrix(1024).astype(np.float64)
    w = T.sine_window(1024).astype(np.float64)
    S = np.zeros((1024, 2048))
    i = np.arange(512)
    S[511 - i, i] += -w[i]
    S[i, 512 + i] += w[512 + i]
    S[512 + i, 1024 + i] += w[1023 - i]
    S[512 + 511 - i, 1024 + 512 + i] += w[511 - i]
    A = M @ S
    return (A.T / 512.0).astype(np.float32)


@functools.cache
def _enc_vlc(cb: int):
    codes, bits = T.spectral_codes(cb)
    return codes.astype(np.int64), bits.astype(np.int64)


@functools.cache
def _sf_vlc_enc():
    codes, bits = T.scalefactor_codes()
    return codes.astype(np.int64), bits.astype(np.int64)


def _quantize(c: np.ndarray, sf_idx: int) -> np.ndarray:
    """AAC quantizer: q = sign * floor(|c * 2^(-(sf-140)/4)|^(3/4) + 0.4054);
    the decoder reconstructs coef = -sign(q)*|q|^(4/3)*2^((sf-140)/4)
    (aacdec.c:816 with the no-bias sf_offset), so the encoder flips sign."""
    step = 2.0 ** (-(sf_idx - 140) / 4.0)
    mag = np.floor(np.abs(c * step) ** 0.75 + 0.4054)
    mag = np.minimum(mag, MAX_QUANT)
    return (-np.sign(c) * mag).astype(np.int64)


def _band_sf(c: np.ndarray, qstep: int) -> int:
    """Choose the band scalefactor so max|q| <= qstep."""
    peak = np.abs(c).max()
    if peak == 0:
        return 0
    # |q| ~ (peak * 2^(-(sf-140)/4))^(3/4) <= qstep
    sf = 140 - 4 * (np.log2(max(peak, 1e-9)) - (4.0 / 3.0) * np.log2(qstep))
    sf = int(np.ceil(sf))
    while np.abs(_quantize(c, sf)).max() > qstep and sf < 255:
        sf += 1
    return int(np.clip(sf, 0, 255))


def _codebook_for(q: np.ndarray) -> int:
    amax = int(np.abs(q).max()) if len(q) else 0
    if amax == 0:
        return 0
    if amax <= 1:
        return 2
    if amax <= 2:
        return 4
    if amax <= 4:
        return 6
    if amax <= 7:
        return 8
    if amax <= 12:
        return 10
    return 11


def _write_band(bw: BitWriter, q: np.ndarray, cb: int) -> None:
    codes, bits = _enc_vlc(cb)
    dim, lav, signed = T.CODEBOOK_INFO[cb]
    mod = 2 * lav + 1 if signed else lav + 1
    off = lav if signed else 0
    for k in range(0, len(q), dim):
        tup = q[k:k + dim]
        if signed:
            idx = 0
            for v in tup:
                idx = idx * mod + (int(v) + off)
            bw.put(int(bits[idx]), int(codes[idx]))
        else:
            idx = 0
            esc = []
            for v in tup:
                av = min(abs(int(v)), 16 if cb == 11 else lav)
                idx = idx * mod + av
                if cb == 11 and abs(int(v)) >= 16:
                    esc.append(abs(int(v)))
            bw.put(int(bits[idx]), int(codes[idx]))
            for v in tup:  # sign bits for nonzero, spectral order
                if v:
                    bw.put1(1 if v < 0 else 0)
            for av in esc:  # escape sequences after the signs
                n = av.bit_length() - 1
                bw.put(n - 4, (1 << (n - 4)) - 1)  # n-4 ones
                bw.put(1, 0)
                bw.put(n, av - (1 << n))


class AacEncoder:
    """AAC encoder: int16 PCM [n, ch] -> ADTS bytes.

    object_type 2 = LC (default); 1 = Main with frequency-domain
    prediction (the encoder mirrors the decoder's predictor state,
    aacdec.c:1271-1322, and codes residuals)."""

    def __init__(self, sample_rate: int, channels: int, qstep: int = 28,
                 object_type: int = 2):
        if channels not in (1, 2):
            raise ValueError("mono or stereo only")
        if object_type not in (1, 2):
            raise ValueError("AAC-LC or AAC-Main only")
        sr = np.asarray(T.SAMPLE_RATES)
        idx = np.where(sr == sample_rate)[0]
        if not len(idx):
            raise ValueError(f"unsupported sample rate {sample_rate}")
        self.sampling_index = int(idx[0])
        self.sample_rate = sample_rate
        self.channels = channels
        self.qstep = qstep
        self.object_type = object_type
        self.swb_offset = T.swb_offset_1024(self.sampling_index)
        self.num_swb = T.num_swb_1024(self.sampling_index)
        if object_type == 1:
            from ..bitstream import aac_syntax as syn
            self._syn = syn
            self._pred_state = [syn.new_predictor_state()
                                for _ in range(channels)]
            self._pred_max = T.pred_sfb_max(self.sampling_index)
            self._frame_no = 0
            self._sf_scale = np.float32(1.0 / -1024.0)

    # ---------------- AAC-Main prediction --------------------------------
    def _predict_values(self, ch: int):
        """pv per bin from the mirrored decoder state (aacdec.c:1280-1283)."""
        syn = self._syn
        st = self._pred_state[ch]
        kmax = int(self.swb_offset[min(self._pred_max, self.num_swb)])
        cor0, cor1 = st[:kmax, 0], st[:kmax, 1]
        var0, var1 = st[:kmax, 2], st[:kmax, 3]
        r0, r1 = st[:kmax, 4], st[:kmax, 5]
        a = np.float32(0.953125)
        k1 = np.where(var0 > 1, cor0 * syn._flt16_even(a / var0), 0).astype(np.float32)
        k2 = np.where(var1 > 1, cor1 * syn._flt16_even(a / var1), 0).astype(np.float32)
        return syn._flt16_round((k1 * r0 + k2 * r1).astype(np.float32)), k1, kmax

    def _predict_update(self, ch: int, dec_coef: np.ndarray, k1, kmax,
                        reset_group: int):
        """State update from the decoded spectra (aacdec.c:1287-1296)."""
        syn = self._syn
        st = self._pred_state[ch]
        alpha = np.float32(0.90625)
        a = np.float32(0.953125)
        r0, r1 = st[:kmax, 4].copy(), st[:kmax, 5].copy()
        e0 = (dec_coef[:kmax] / self._sf_scale).astype(np.float32)
        e1 = (e0 - k1 * r0).astype(np.float32)
        st[:kmax, 1] = syn._flt16_trunc((alpha * st[:kmax, 1] + r1 * e1).astype(np.float32))
        st[:kmax, 3] = syn._flt16_trunc((alpha * st[:kmax, 3] + np.float32(0.5) * (r1 * r1 + e1 * e1)).astype(np.float32))
        st[:kmax, 0] = syn._flt16_trunc((alpha * st[:kmax, 0] + r0 * e0).astype(np.float32))
        st[:kmax, 2] = syn._flt16_trunc((alpha * st[:kmax, 2] + np.float32(0.5) * (r0 * r0 + e0 * e0)).astype(np.float32))
        st[:kmax, 5] = syn._flt16_trunc((a * (r0 - k1 * e0)).astype(np.float32))
        st[:kmax, 4] = syn._flt16_trunc((a * e0).astype(np.float32))
        if reset_group:
            idxs = np.arange(reset_group - 1, syn.MAX_PREDICTORS, 30)
            st[idxs] = 0.0
            st[idxs, 2] = 1.0
            st[idxs, 3] = 1.0

    # ---------------- per-channel ICS -----------------------------------
    def _encode_ics(self, bw: BitWriter, coefs: np.ndarray,
                    ch: int = 0) -> None:
        offs = self.swb_offset
        nb = self.num_swb
        predicting = self.object_type == 1
        if predicting:
            pv, k1_arr, kmax = self._predict_values(ch)
            reset_group = (self._frame_no % 30) + 1
            nmax = min(nb, self._pred_max)
            pred_used = np.ones(nmax, np.int64)
            residual = coefs.copy()
            residual[:kmax] = (residual[:kmax]
                               - pv * self._sf_scale).astype(np.float32)
            coefs = residual
        sfs = np.zeros(nb, np.int64)
        qs = []
        cbs = np.zeros(nb, np.int64)
        for b in range(nb):
            band = coefs[offs[b]:offs[b + 1]]
            sf = _band_sf(band, self.qstep)
            q = _quantize(band, sf)
            cb = _codebook_for(q)
            sfs[b] = sf if cb else 0
            cbs[b] = cb
            qs.append(q)
        # clamp scalefactor deltas to +-60 (spec SCALE_MAX_DIFF)
        coded = np.nonzero(cbs)[0]
        for j in range(1, len(coded)):
            a, b = coded[j - 1], coded[j]
            lo, hi = sfs[a] - 60, sfs[a] + 60
            if not lo <= sfs[b] <= hi:
                sfs[b] = int(np.clip(sfs[b], lo, hi))
                qs[b] = _quantize(coefs[offs[b]:offs[b + 1]], int(sfs[b]))
                qs[b] = np.clip(qs[b], -MAX_QUANT, MAX_QUANT)
                cbs[b] = _codebook_for(qs[b])

        global_gain = int(sfs[coded[0]]) if len(coded) else 100
        bw.put(8, global_gain)
        # ics_info: long window, sine shape
        bw.put1(0)          # reserved
        bw.put(2, 0)        # ONLY_LONG_SEQUENCE
        bw.put1(0)          # use_kb_window
        bw.put(6, nb)       # max_sfb
        if predicting:
            bw.put1(1)      # predictor_data_present
            bw.put1(1)      # predictor_reset
            bw.put(5, reset_group)
            for sfb in range(nmax):
                bw.put1(int(pred_used[sfb]))
        else:
            bw.put1(0)      # predictor_data_present
        # section_data (5-bit runs, esc=31)
        b = 0
        while b < nb:
            cb = cbs[b]
            run = 1
            while b + run < nb and cbs[b + run] == cb:
                run += 1
            bw.put(4, int(cb))
            r = run
            while r >= 31:
                bw.put(5, 31)
                r -= 31
            bw.put(5, r)
            b += run
        # scalefactor data (delta huffman)
        sf_codes, sf_bits = _sf_vlc_enc()
        prev = global_gain
        for b in range(nb):
            if cbs[b] == 0:
                continue
            d = int(sfs[b]) - prev + 60
            bw.put(int(sf_bits[d]), int(sf_codes[d]))
            prev = int(sfs[b])
        bw.put1(0)  # pulse_data_present
        bw.put1(0)  # tns_data_present
        bw.put1(0)  # gain_control_data_present
        # spectral data
        for b in range(nb):
            if cbs[b]:
                _write_band(bw, qs[b], int(cbs[b]))
        if predicting:
            # mirror the decoder: decoded residual + enabled prediction
            dec = np.zeros(1024, np.float32)
            for b in range(nb):
                band_q = qs[b]
                step = np.float32(2.0 ** ((int(sfs[b]) - 140) / 4.0))
                vq = (-np.sign(band_q)
                      * np.abs(band_q).astype(np.float32) ** (4.0 / 3.0))
                dec[offs[b]:offs[b + 1]] = (vq * step).astype(np.float32)
            enable = np.zeros(kmax, bool)
            for sfb in range(nmax):
                if pred_used[sfb]:
                    enable[int(offs[sfb]):int(offs[sfb + 1])] = True
            dec[:kmax] = np.where(
                enable, (dec[:kmax] + pv * self._sf_scale).astype(np.float32),
                dec[:kmax])
            self._predict_update(ch, dec, k1_arr, kmax, reset_group)

    def _encode_frame(self, block: np.ndarray) -> bytes:
        """block: float [2048, ch] -> one raw_data_block."""
        F = _analysis_matrix()
        bw = BitWriter()
        if self.channels == 1:
            bw.put(3, T.TYPE_SCE)
            bw.put(4, 0)
            self._encode_ics(bw, block[:, 0] @ F, 0)
        else:
            bw.put(3, T.TYPE_CPE)
            bw.put(4, 0)
            bw.put1(0)  # common_window = 0 (independent ICS info)
            self._encode_ics(bw, block[:, 0] @ F, 0)
            self._encode_ics(bw, block[:, 1] @ F, 1)
        bw.put(3, T.TYPE_END)
        bw.align()
        if self.object_type == 1:
            self._frame_no += 1
        return bw.bytes()

    def encode(self, pcm: np.ndarray) -> bytes:
        """pcm int16 [n, ch] -> ADTS byte stream."""
        pcm = np.asarray(pcm)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n = pcm.shape[0]
        nframes = (n + 1023) // 1024
        padded = np.zeros((nframes * 1024 + 1024, pcm.shape[1]), np.float32)
        padded[1024:1024 + n] = pcm.astype(np.float32)  # 1-frame lead-in
        frames = []
        for t in range(nframes + 1):
            block = padded[t * 1024:(t + 2) * 1024]
            if block.shape[0] < 2048:
                block = np.pad(block, ((0, 2048 - block.shape[0]), (0, 0)))
            frames.append(self._encode_frame(block))
        return mux_adts(frames, self.object_type, self.sample_rate,
                        1 if self.channels == 1 else 2)
