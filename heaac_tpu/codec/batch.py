"""Batched multi-stream decode: the throughput pipeline.

Host front-end parses each stream's frames into dense plans
(codec/frame_plan.py); the device decodes all B lanes per frame through the
fused HE-AACv2 graph.  This is the TPU-native replacement for the
reference's per-frame scalar loop — thousands of independent streams per
batch (SURVEY.md §7 step 6).
"""
from __future__ import annotations

import numpy as np

from ..bitstream.adts import parse_adts_header, split_adts_stream
from ..bitstream.reader import BitReader
from ..tables import aac_tables as T
from . import compact_plan, frame_plan
from .decoder import Decoder
from .heaac_graph import (HeaacState, init_compact_state, init_state,
                          jitted_heaac_frame)



def _host_couple_and_tns(dec, raise_point3: bool = True) -> None:
    """Dependent channel coupling + TNS in reference order (host side),
    shared by the planning decoders (aacdec.c:1870-1898 stages 0/1).

    AFTER_IMDCT (point 3) coupling mixes decoded TIME signals: the LC
    and qwire batched paths express it as a post-scan device mix over
    extra CCE lanes (LcPlanningDecoder / QwirePlanningDecoder +
    qwire_scan_decoder_couple); only the dense-plan HE planner still
    routes such streams to the single-stream decoder (raise_point3)."""
    from ..bitstream import aac_syntax as syn
    dec._apply_dependent_coupling_stage(0, before_tns=True)
    for lane in dec.lanes + dec.cce_lanes:
        el = dec.elements[(lane.elem_type, lane.elem_id)]
        cd = el.cur[lane.ch]
        if el.present_this_frame and cd.coeffs is not None \
                and cd.tns.present:
            syn.apply_tns(cd.coeffs, cd)
            cd.tns = syn.TnsData()
    dec._apply_dependent_coupling_stage(1, before_tns=False)
    if not raise_point3:
        return
    for (etype, _), el in dec.elements.items():
        if etype == T.TYPE_CCE and el.coup is not None \
                and el.present_this_frame and el.coup.coupling_point == 3:
            raise NotImplementedError(
                "AFTER_IMDCT coupling with SBR needs the single-stream "
                "decoder (the LC batched path handles it)")


def _point3_edges(dec, lane_index_of) -> list:
    """This frame's AFTER_IMDCT coupling edges [(tgt_lane, src_lane,
    gain)], mirroring decoder._apply_independent_coupling
    (aacdec.c:1849-1862)."""
    edges = []
    for key, el in dec.elements.items():
        if key[0] != T.TYPE_CCE or el.coup is None \
                or not el.present_this_frame \
                or el.coup.coupling_point != 3:
            continue
        src = lane_index_of.get((T.TYPE_CCE, key[1], 0))
        if src is None:
            continue
        coup = el.coup
        index = 0
        for c in range(coup.num_coupled + 1):
            tkey = (coup.type[c], coup.id_select[c])
            ch_sel = coup.ch_select[c]
            if dec.elements.get(tkey) is None:
                index += 1 + (ch_sel == 3)
                continue
            if ch_sel != 1:
                li = lane_index_of.get((tkey[0], tkey[1], 0))
                if li is not None:
                    edges.append((li, src, float(coup.gain[index][0])))
                if ch_sel != 0:
                    index += 1
            if ch_sel != 2:
                li = lane_index_of.get((tkey[0], tkey[1], 1))
                if li is not None:
                    edges.append((li, src, float(coup.gain[index][0])))
                index += 1
    return edges


def _point3_edges_sub(dec, qpos) -> list:
    """This frame's AFTER_IMDCT coupling edges [(tgt_lane, tgt_sub,
    src_lane, gain)] in the emitted qwire lane numbering; ``qpos`` maps
    (etype, eid, ch) -> (lane, stereo sub).  Mirrors
    decoder._apply_independent_coupling (aacdec.c:1849-1862); SCE targets
    always have ch_select==2 (decode_cce, aacdec.c:1523) so only their L
    sub-channel is coupled, exactly like the reference."""
    edges = []
    for key, el in dec.elements.items():
        if key[0] != T.TYPE_CCE or el.coup is None \
                or not el.present_this_frame \
                or el.coup.coupling_point != 3:
            continue
        src = qpos.get((T.TYPE_CCE, key[1], 0))
        if src is None:
            continue
        coup = el.coup
        index = 0
        for c in range(coup.num_coupled + 1):
            tkey = (coup.type[c], coup.id_select[c])
            ch_sel = coup.ch_select[c]
            if dec.elements.get(tkey) is None:
                index += 1 + (ch_sel == 3)
                continue
            if ch_sel != 1:
                p = qpos.get((tkey[0], tkey[1], 0))
                if p is not None:
                    edges.append(p + (src[0], float(coup.gain[index][0])))
                if ch_sel != 0:
                    index += 1
            if ch_sel != 2:
                p = qpos.get((tkey[0], tkey[1], 1))
                if p is not None:
                    edges.append(p + (src[0], float(coup.gain[index][0])))
                index += 1
    return edges


def _couple_series(frames_couple: list):
    """Per-frame edge lists -> (struct [(tgt_lane, tgt_sub, src_lane)],
    gains [T, K] f32) with one edge structure for the whole stream (gain
    0 on frames where an edge is absent), or None without any edges."""
    struct = sorted({e[:3] for fr in frames_couple for e in fr})
    if not struct:
        return None
    pos = {e: k for k, e in enumerate(struct)}
    gains = np.zeros((len(frames_couple), len(struct)), np.float32)
    for t, fr in enumerate(frames_couple):
        for tl, ts, sl, g in fr:
            gains[t, pos[(tl, ts, sl)]] = g
    return struct, gains


def _align_union_layout(dec) -> None:
    """Realign dec.frames_q/frames_couple onto the union lane layout
    (see parse_stream_qwire); frames missing an element ship silence on
    its lane.  Error-silence rows (frames_keys None) become full-width
    silence rows."""
    from . import qwire
    union: list = []
    seen: set = set()
    for fk in dec.frames_keys:
        for k in fk or ():
            if k is not None and k not in seen:
                seen.add(k)
                union.append(k)
    ucce = [k for k in union if k[0] == T.TYPE_CCE]
    union = [k for k in union if k[0] != T.TYPE_CCE] + ucce
    pos = {k: i for i, k in enumerate(union)}
    sil = qwire.silence_lane()
    new_q, new_c = [], []
    for fk, fr, cpl in zip(dec.frames_keys, dec.frames_q,
                           dec.frames_couple):
        row = [sil] * len(union)
        remap: dict = {}
        if fk is not None:
            for i, k in enumerate(fk):
                if k is not None and i < len(fr):
                    row[pos[k]] = fr[i]
                    remap[i] = pos[k]
        new_q.append(row)
        new_c.append([(remap[tl], ts, remap[sl], g)
                      for (tl, ts, sl, g) in cpl
                      if tl in remap and sl in remap])
    dec.frames_q = new_q
    dec.frames_couple = new_c
    dec.out_nl = len(union) - len(ucce)


class PlanningDecoder(Decoder):
    """Parses a mono HE-AACv2 stream into per-frame device plans instead of
    running the numpy DSP.  With ``compact=True`` (the wire default) each
    frame-lane becomes the ~3 KB compact record of codec/compact_plan.py,
    expanded on device; otherwise the dense frame_plan tensors."""

    def __init__(self, *a, compact: bool = False, **kw):
        super().__init__(*a, **kw)
        self.compact = compact
        self.frames_core = []
        self.frames_sbr = []
        self.frames_ps = []
        self.ps_is34 = None   # stream band mode, fixed at first PS frame
        self.downsampled = 0  # 32-band synthesis (explicit ext==core rate)

    def _spectral_to_sample(self, present):
        m = self.m4ac
        from ..bitstream.sbr_syntax import SBRContext
        _host_couple_and_tns(self)
        cores, sbrs, pss = [], [], []
        done = set()
        for lane in self.lanes:
            key = (lane.elem_type, lane.elem_id)
            el = self.elements[key]
            is_ps = (lane.elem_type == T.TYPE_SCE and m.ps == 1)
            if is_ps and lane.ch == 1:
                continue  # PS second output shares the SCE lane
            cd = el.cur[lane.ch]
            cores.append(dict(
                coeffs=cd.coeffs.copy(),
                ws=np.int32(cd.ics.window_sequence),
                wsp=np.int32(cd.ics.window_sequence_prev),
                kbd=np.int32(cd.ics.use_kb_window),
                kbdp=np.int32(cd.ics.use_kb_window_prev)))
            if m.sbr == 1:
                if el.sbr is None:
                    el.sbr = SBRContext()
                if not el.sbr.sample_rate:
                    el.sbr.sample_rate = 2 * m.sample_rate
                if not m.ext_sample_rate:
                    m.ext_sample_rate = 2 * m.sample_rate
                self.downsampled = int(m.ext_sample_rate <= m.sample_rate)
                if el.sbr.ps is not None and el.sbr.ps.start:
                    cur34 = int(el.sbr.ps.is34bands)
                    if self.ps_is34 is None:
                        self.ps_is34 = cur34
                    elif self.ps_is34 != cur34:
                        # band mode flips mid-stream: the scan graph is
                        # compiled per mode -> single-stream numpy fallback
                        raise NotImplementedError(
                            "PS band mode changes mid-stream")
                build = (compact_plan.build_sbr_compact if self.compact
                         else frame_plan.build_sbr_plan)
                plan = build(el.sbr, lane.ch, lane.elem_type,
                             dequant_done=key in done)
                done.add(key)
                top = el.sbr.kx[1] + el.sbr.m[1]
                ps_build = (compact_plan.build_ps_compact if self.compact
                            else frame_plan.build_ps_plan)
                ps_plan = ps_build(el.sbr.ps if is_ps else None, top,
                                   is34=self.ps_is34 or 0)
            elif self.compact:
                plan = compact_plan.zeros_compact()
                ps_plan = compact_plan.zeros_ps_compact()
            else:
                plan = frame_plan._zeros_plan()
                ps_plan = frame_plan.build_ps_plan(None, 64)
            sbrs.append(plan)
            pss.append(ps_plan)
        self.frames_core.append(cores)
        self.frames_sbr.append(sbrs)
        self.frames_ps.append(pss)
        self.sample_rate = m.sample_rate << (
            (m.ext_sample_rate > m.sample_rate) if m.sbr == 1 else 0)
        return np.zeros((0, 1), np.int16)


def parse_stream_plans(data: bytes, asc: bytes | None = None,
                       max_frames: int | None = None,
                       compact: bool = False):
    """Parse one ADTS stream into (core, sbr, ps) per-frame plan dicts with
    a leading per-stream lane axis folded into the batch: leaf shapes are
    [T, n_lanes, ...].  With ``asc`` given, configuration comes from the
    AudioSpecificConfig (explicit SBR signaling, e.g. downsampled mode) and
    the ADTS headers are treated as framing only.  ``compact=True`` emits
    the compact wire records (codec/compact_plan.py) instead of dense
    tensors."""
    frames = split_adts_stream(data)
    if max_frames is not None:
        frames = frames[:max_frames]
    if asc is not None:
        dec = PlanningDecoder(asc=asc, compact=compact)
        # strip the per-frame ADTS header: 9 bytes when a CRC is present
        # (protection_absent=0), 7 otherwise (io/adts.py:74 convention)
        frames = [f[9 - (f[1] & 1) * 2:] for f in frames]
    else:
        hdr = parse_adts_header(BitReader(frames[0][:7]))
        if hdr.chan_config <= 7 and hdr.object_type in (1, 2):
            # native whole-stream HE host front-end (he_host.inc): ADTS +
            # core + SBR/PS side info + plan assembly in one C++ call,
            # bit-exact vs this Python path, for chan_config 0-7 (in-band
            # PCE incl.), LC and Main (per-lane predictor state in C++);
            # falls through for SSR or PS band-mode changes
            from .. import native
            if native.available():
                parse = (native.parse_he_stream_compact if compact
                         else native.parse_he_stream)
                r = parse(data, hdr.sampling_index, hdr.sample_rate,
                          hdr.chan_config, len(frames))
                if r is not None:
                    core, sbr, ps, info = r
                    rate = hdr.sample_rate << (1 if info["sbr"] else 0)
                    return (core, sbr, ps, rate, info["lanes"],
                            info["is34"], 0)
        dec = PlanningDecoder(adts_probe=frames[0][:7], compact=compact)
    from ..bitstream.reader import BitstreamError
    for f in frames:
        n_before = len(dec.frames_core)
        try:
            dec.decode_frame(f)
        except BitstreamError:
            # per-stream error isolation (SURVEY.md §5): a corrupt frame
            # becomes silence in its lane instead of desynchronizing the
            # batch; the frame count stays aligned across lanes
            dec.error_count += 1
            if len(dec.frames_core) == n_before:
                if dec.frames_core:
                    nl_ = len(dec.frames_core[0])
                elif dec.lanes:
                    # plan lanes = configured output lanes, with the PS
                    # second output collapsed onto its SCE lane
                    nl_ = sum(1 for ln in dec.lanes
                              if not (ln.elem_type == T.TYPE_SCE
                                      and ln.ch == 1))
                else:
                    nl_ = 1
                zc = dict(coeffs=np.zeros(1024, np.float32),
                          ws=np.int32(0), wsp=np.int32(0),
                          kbd=np.int32(0), kbdp=np.int32(0))
                dec.frames_core.append([dict(zc) for _ in range(nl_)])
                if compact:
                    dec.frames_sbr.append(
                        [compact_plan.zeros_compact() for _ in range(nl_)])
                    dec.frames_ps.append(
                        [compact_plan.zeros_ps_compact()
                         for _ in range(nl_)])
                else:
                    dec.frames_sbr.append(
                        [frame_plan._zeros_plan() for _ in range(nl_)])
                    dec.frames_ps.append(
                        [frame_plan.build_ps_plan(None, 64)
                         for _ in range(nl_)])
    if not dec.frames_core:
        raise BitstreamError("no decodable frames in stream")
    nl = len(dec.frames_core[0])

    def stack_dicts(frames_list):
        return {k: np.stack([np.stack([np.asarray(lane[k]) for lane in fr])
                             for fr in frames_list])
                for k in frames_list[0][0]}

    core = stack_dicts(dec.frames_core)
    if compact:
        sbr = stack_dicts(dec.frames_sbr)
    else:
        sbr_keys = frame_plan.SbrChannelPlan.__dataclass_fields__
        sbr = {k: np.stack([np.stack([np.asarray(getattr(lane, k))
                                      for lane in fs])
                            for fs in dec.frames_sbr])
               for k in sbr_keys}
    ps = stack_dicts(dec.frames_ps)
    return core, sbr, ps, dec.sample_rate, nl, dec.ps_is34 or 0, \
        dec.downsampled


class BatchDecoder:
    """Decode B copies (or B distinct same-config streams) on device."""

    def __init__(self, stream: bytes, batch: int = 512):
        self.B = batch
        core, sbr, ps, rate, _nl, is34, ds = parse_stream_plans(stream)
        self.sample_rate = rate
        self.is34 = is34
        self.ds = ds
        self.T = len(core["coeffs"])
        # tile per-frame plans across the batch lazily per frame
        self.core, self.sbr, self.ps = core, sbr, ps
        self.state = None

    def _tile(self, d, t):
        return {k: np.broadcast_to(v[t][None], (self.B,) + v[t].shape)
                for k, v in d.items()}

    def frame_inputs(self, t):
        return (self._tile(self.core, t), self._tile(self.sbr, t),
                self._tile(self.ps, t))

    def warmup(self):
        import jax
        step = jitted_heaac_frame()
        self.state = init_state(self.B)
        c, s, p = self.frame_inputs(0)
        pcm, st = step(c, s, p, self.state, self.is34, self.ds)
        pcm.block_until_ready()
        # state was donated; rebuild fresh for the timed run
        self.state = init_state(self.B)
        jax.block_until_ready(self.state)

    def run(self) -> float:
        """Decode all frames once; returns decoded audio seconds."""
        step = jitted_heaac_frame()
        state = self.state if self.state is not None else init_state(self.B)
        pcm = None
        for t in range(self.T):
            c, s, p = self.frame_inputs(t)
            pcm, state = step(c, s, p, state, self.is34, self.ds)
        pcm.block_until_ready()
        self.state = None
        return self.B * self.T * 2048 / self.sample_rate

    def decode_all(self):
        """Decode and return int16 PCM [B, T*2048, 2] (for validation)."""
        step = jitted_heaac_frame()
        state = init_state(self.B)
        outs = []
        for t in range(self.T):
            c, s, p = self.frame_inputs(t)
            pcm, state = step(c, s, p, state, self.is34, self.ds)
            outs.append(np.asarray(pcm))
        pcm_f = np.concatenate(outs, axis=2)           # [B,2,T*2048]
        pcm = np.clip(np.rint(pcm_f), -32768, 32767).astype(np.int16)
        return pcm.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Quantized wire format (codec/qwire.py): Python-planner emitters
# ---------------------------------------------------------------------------
class QwirePlanningDecoder(Decoder):
    """Parses a stream into qwire frame-lane payloads (codec/qwire.py).

    The Python planner has only the final float coefficients, so spectra are
    shipped as raw-f32 tokens (exact, ~5x fatter than the native emitter's
    integer tokens); SBR/PS side-info ships as integer codes with host
    dequantization skipped — the device performs sbr_dequant/mapping/chirp."""

    def __init__(self, *a, **kw):
        # parse with the pure-Python syntax layer: the native per-element
        # parser never captures spectral bit positions (decoder.py
        # _native_sce), so spec-mode (raw-bits) lanes — and the gating
        # tested by tests/test_spec_gating.py — require decode_ics
        kw.setdefault("use_native", False)
        super().__init__(*a, **kw)
        self.frames_q = []   # per frame: list of per-lane (payload, rec)
        self.ps_is34 = None
        self.downsampled = 0
        self._hdr_sent = set()
        self._cur_packet = b""
        # mid-stream 20<->34 band-mode flips: rejected by default (the
        # static per-mode scan graphs would mis-decode); the flip-capable
        # path (decode_qwire_flip_stream) opts in and reads the per-frame
        # mode trail from is34_frames
        self.allow_ps_flips = False
        self.cur_is34 = None     # THIS frame's effective PS band mode
        self.is34_frames: list = []
        # AFTER_IMDCT (point 3) CCE: per frame [(tgt_lane, tgt_sub,
        # src_lane, gain)] in the emitted qwire lane numbering (CCE
        # elements ride extra non-output lanes, aacdec.c:1919-1929)
        self.frames_couple: list = []
        self.out_nl = None       # output lanes (excludes CCE lanes)
        # per-frame lane identity keys [(etype, eid, ch)] parallel to
        # frames_q rows (None for error-silence rows): a mid-stream PCE
        # that changes the layout is realigned onto the union layout by
        # parse_stream_qwire instead of demoting (aacdec.c:224-302)
        self.frames_keys: list = []

    def decode_frame(self, packet: bytes):
        # scope the bandpos-capture flag to THIS parse: a module-global
        # left set would make every later Decoder in the process pay the
        # per-band capture in the hot VLC loop (round-3 review finding)
        from ..bitstream import aac_syntax as syn
        self._cur_packet = bytes(packet)
        prev = syn.CAPTURE_SPEC
        syn.CAPTURE_SPEC = True
        try:
            return super().decode_frame(packet)
        finally:
            syn.CAPTURE_SPEC = prev

    def _try_spec_block(self, cd, ms_mask=None):
        """Raw-bits spec block for a clean lane, or None.

        Eligible when nothing modifies the decoded spectrum after the
        VLC loop: LC object, no pulses/TNS, no noise/intensity bands, no
        channel coupling in the stream.  EIGHT_SHORT frames ship a
        grouping byte and (group, sfb)-ordered sections (W3_SHORT); the
        device de-interleaves.  ``ms_mask`` (per-sfb, length max_sfb)
        rides the block for CPE pairs whose M/S butterfly moves to the
        device (the raw bits are PRE-M/S; see _try_spec_cpe)."""
        from . import qwire
        from ..ops import spec_huff as SH
        ics = cd.ics
        is8 = ics.window_sequence == T.EIGHT_SHORT
        # bandpos is only captured for clean lanes (decode_ics: no
        # pulses/TNS) — the checks here are belt and braces since TNS is
        # applied+cleared before this point
        bp = getattr(cd, "spec_bandpos", None)
        if (self.m4ac.object_type != 2 or not bp
                or (not is8 and ics.num_window_groups != 1)
                or getattr(cd, "pulse_present", False)):
            return None
        if any(et == T.TYPE_CCE for (et, _) in self.elements):
            return None
        nbands = ics.num_window_groups * ics.max_sfb
        bt = np.asarray(cd.band_type[:nbands])
        if nbands and (bt > 11).any():
            return None
        nbits = bp[-1] - bp[0]
        if nbits >= (1 << 13):
            return None
        sfpos = getattr(cd, "spec_sfpos", None)
        if sfpos is None or sfpos[1] - sfpos[0] > SH.SFB - 24:
            return None              # sf region must fit the device axis
        secs = []
        sfidx0 = None
        for grp in range(ics.num_window_groups):
            i = 0
            while i < ics.max_sfb:   # runs never cross a group boundary
                b0 = grp * ics.max_sfb + i
                cb = int(bt[b0])
                j = i
                while j < ics.max_sfb \
                        and int(bt[grp * ics.max_sfb + j]) == cb:
                    j += 1
                blen = bp[grp * ics.max_sfb + j] - bp[b0]
                if blen >= (1 << 14):
                    return None
                secs.append((cb, j - i, blen))
                if cb >= 1 and sfidx0 is None:
                    sfidx0 = qwire.sfidx_from_sf(
                        cd.sf[grp * ics.max_sfb + i])
                    if sfidx0 is None:
                        return None
                i = j
        if len(secs) > SH.SEC_MAX:
            return None
        # raw bits: one byte-aligned slice spanning the sf-huffman region
        # through the spectral region — contiguous up to the 3 always-
        # zero pulse/tns/gain gate bits, which ship in place (the device
        # skips them; ops/spec_huff.decode_spec_jax)
        if bp[0] != sfpos[1] + 3:
            return None              # non-standard gate span: token mode
        bits = self._cur_packet[sfpos[0] >> 3:(bp[-1] + 7) >> 3]
        phase = sfpos[0] & 7
        grouping = None
        if is8:
            # bit (7-w) set iff window w shares window w-1's group
            grouping = 0
            w = 0
            for g in range(ics.num_window_groups):
                for r in range(ics.group_len[g]):
                    if r >= 1:
                        grouping |= 1 << (7 - w)
                    w += 1
        return SH.pack_spec_block(secs, sfidx0 or 0, bits, nbits,
                                  ms_mask=ms_mask, grouping=grouping,
                                  phase=phase)

    def _try_spec_cpe(self, el):
        """Spec blocks for a CPE's two channels, each entry None when
        that channel must ship tokens.

        Without effective M/S the channels are independent raw-bits
        lanes (intensity in ch1 only reads ch0, whose raw bits decode to
        its final values).  With effective M/S the raw bits predate the
        butterfly (aacdec.c:1390), so spec mode requires BOTH channels
        eligible: the mask ships on the left lane and the device applies
        the pair butterfly (W3_MS_LEFT/RIGHT)."""
        from ..ops import spec_huff as SH
        ch0, ch1 = el.cur[0], el.cur[1]
        nmask = ch0.ics.num_window_groups * ch0.ics.max_sfb
        mask = (np.asarray(el.ms_mask[:nmask])
                if el.ms_mask is not None else np.zeros(nmask, np.int32))
        bt0 = np.asarray(ch0.band_type[:nmask])
        bt1 = np.asarray(ch1.band_type[:nmask])
        eff = mask.astype(bool) & (bt0 < 13) & (bt1 < 13)
        if eff.any():
            s0 = self._try_spec_block(ch0, ms_mask=eff.astype(np.int32))
            s1 = self._try_spec_block(ch1)
            if s0 is None or s1 is None:
                return (None, None)
            return ((s0[0], s0[1] | SH.W3_MS_LEFT),
                    (s1[0], s1[1] | SH.W3_MS_RIGHT))
        return (self._try_spec_block(ch0), self._try_spec_block(ch1))

    def _spectral_to_sample(self, present):
        from ..bitstream.sbr_syntax import SBRContext
        from . import qwire
        m = self.m4ac
        _host_couple_and_tns(self, raise_point3=False)
        lanes_out = []
        qpos = {}    # (etype, eid, ch) -> (emitted lane, stereo sub)
        for lane in self.lanes + self.cce_lanes:
            key = (lane.elem_type, lane.elem_id)
            el = self.elements[key]
            is_ps = (lane.elem_type == T.TYPE_SCE and m.ps == 1)
            if is_ps and lane.ch == 1:
                # PS second output shares the SCE lane's stereo sub-axis
                qpos[key + (1,)] = (qpos[key + (0,)][0], 1)
                continue
            qpos[key + (lane.ch,)] = (len(lanes_out), 0)
            cd = el.cur[lane.ch]
            meta = dict(ws=int(cd.ics.window_sequence),
                        kbd=int(cd.ics.use_kb_window))
            spec = None
            if lane.elem_type == T.TYPE_SCE and el.present_this_frame:
                # presence gate: an absent element's spec_bandpos is the
                # previous frame's and would slice the WRONG packet
                spec = self._try_spec_block(cd)
            elif lane.elem_type == T.TYPE_CPE and el.present_this_frame:
                if lane.ch == 0:
                    self._cpe_pair = self._try_spec_cpe(el)
                spec = self._cpe_pair[lane.ch]
            if spec is None:
                coeffs = cd.coeffs
                if coeffs is None or not el.present_this_frame:
                    # a CCE absent this frame keeps its lane valid
                    coeffs = np.zeros(1024, np.float32)
                toks, ext = qwire.emit_coeff_tokens(coeffs)
            sbr = None
            header = b""
            if m.sbr == 1:
                if el.sbr is None:
                    el.sbr = SBRContext()
                if not el.sbr.sample_rate:
                    el.sbr.sample_rate = 2 * m.sample_rate
                if not m.ext_sample_rate:
                    m.ext_sample_rate = 2 * m.sample_rate
                self.downsampled = int(m.ext_sample_rate <= m.sample_rate)
                sbr = el.sbr
                if sbr.ps is not None and sbr.ps.start:
                    cur34 = int(sbr.ps.is34bands)
                    if self.ps_is34 is None:
                        self.ps_is34 = cur34
                    elif cur34 != (self.cur_is34
                                   if self.cur_is34 is not None
                                   else self.ps_is34) \
                            and not self.allow_ps_flips:
                        raise NotImplementedError(
                            "PS band mode changes mid-stream")
                    self.cur_is34 = cur34
                hkey = (key, lane.ch)
                if sbr.start and (sbr.reset or hkey not in self._hdr_sent):
                    header = qwire.build_header(sbr)
                    self._hdr_sent.add(hkey)
            side = qwire.build_side(sbr, lane.ch, lane.elem_type,
                                    core_meta=meta,
                                    is34=(self.cur_is34
                                          if self.cur_is34 is not None
                                          else self.ps_is34) or 0)
            if spec is not None:
                lanes_out.append(qwire.assemble_spec_lane(
                    spec[0], spec[1], side, header))
            else:
                lanes_out.append(qwire.assemble_lane(toks, ext, side,
                                                     header))
        self.frames_q.append(lanes_out)
        lane_keys = [None] * len(lanes_out)
        for k3, (ln, sub) in qpos.items():
            if sub == 0:
                lane_keys[ln] = k3
        self.frames_keys.append(lane_keys)
        self.out_nl = len(lanes_out) - len(self.cce_lanes)
        self.frames_couple.append(_point3_edges_sub(self, qpos))
        self.is34_frames.append((self.cur_is34
                                 if self.cur_is34 is not None
                                 else self.ps_is34) or 0)
        self.sample_rate = m.sample_rate << (
            (m.ext_sample_rate > m.sample_rate) if m.sbr == 1 else 0)
        return np.zeros((0, 1), np.int16)


def parse_stream_qwire(data: bytes, asc: bytes | None = None,
                       max_frames: int | None = None,
                       err_out: list | None = None,
                       is34_out: list | None = None,
                       info_out: dict | None = None):
    """One ADTS stream -> (frames list of per-lane (payload, rec), rate,
    n_lanes, is34, downsampled) in the qwire format, with per-frame error
    isolation (corrupt frame -> silence lanes, count stays aligned).
    ``err_out``, if given, receives the stream's corrupt-frame count.
    ``is34_out``, if given, enables mid-stream PS band-mode flips (for
    the flip-capable scan graph) and receives the per-frame mode trail.
    ``info_out``, if given, receives ``out_nl`` (output lanes: n_lanes
    minus trailing CCE lanes) and ``couple`` (None, or the stream's
    AFTER_IMDCT edge structure + per-frame gains from _couple_series)."""
    from ..bitstream.reader import BitstreamError
    from . import qwire

    frames = split_adts_stream(data)
    if max_frames is not None:
        frames = frames[:max_frames]
    if asc is not None:
        dec = QwirePlanningDecoder(asc=asc)
        frames = [f[9 - (f[1] & 1) * 2:] for f in frames]
    else:
        dec = QwirePlanningDecoder(adts_probe=frames[0][:7])
    if is34_out is not None:
        dec.allow_ps_flips = True
    for f in frames:
        n_before = len(dec.frames_q)
        try:
            dec.decode_frame(f)
        except BitstreamError:
            dec.error_count += 1
            if len(dec.frames_q) == n_before:
                if dec.frames_q:
                    nl_ = len(dec.frames_q[0])
                elif dec.lanes:
                    nl_ = sum(1 for ln in dec.lanes
                              if not (ln.elem_type == T.TYPE_SCE
                                      and ln.ch == 1)) \
                        + len(dec.cce_lanes)
                else:
                    nl_ = 1
                sil = qwire.silence_lane()
                dec.frames_q.append([sil for _ in range(nl_)])
                dec.frames_keys.append(None)
                dec.frames_couple.append([])
                dec.is34_frames.append(dec.is34_frames[-1]
                                       if dec.is34_frames else 0)
    if not dec.frames_q:
        raise BitstreamError("no decodable frames in stream")
    nl = len(dec.frames_q[0])
    if any(len(fr) != nl for fr in dec.frames_q):
        # mid-stream layout change (a PCE reconfigure or a CCE appearing
        # later): realign every frame onto the UNION layout -- stable
        # lane slots keyed by (etype, eid, ch), output lanes first, CCE
        # lanes last, silence where an element is absent.  This is the
        # batched analogue of the reference's in-stream output_configure
        # (aacdec.c:224-302, aac.h:104-110 OCStatus).
        _align_union_layout(dec)
        nl = len(dec.frames_q[0])
    if err_out is not None:
        err_out.append(dec.error_count)
    if is34_out is not None:
        is34_out.extend(dec.is34_frames)
    if info_out is not None:
        info_out["out_nl"] = dec.out_nl if dec.out_nl is not None else nl
        info_out["couple"] = _couple_series(dec.frames_couple)
    return (dec.frames_q, dec.sample_rate, nl,
            dec.ps_is34 or 0, dec.downsampled)


def _flatten_couple(couples: list, nl: int, T: int):
    """Per-slot (struct, gains)|None -> batched AFTER_IMDCT edge arrays
    (etgt [K] i32, etch [K] i32, esrc [K] i32, gains [T, K] f32) over the
    global lane axis (slot b's lanes start at b*nl), or None when no slot
    couples.  Per-stream gains shorter than T pad with 0 (silence)."""
    etgt, etch, esrc, gcols = [], [], [], []
    for b, couple in enumerate(couples):
        if not couple:
            continue
        struct, gains = couple
        for k, (tl, ts, sl) in enumerate(struct):
            etgt.append(b * nl + tl)
            etch.append(ts)
            esrc.append(b * nl + sl)
            col = np.zeros(T, np.float32)
            col[:len(gains)] = gains[:T, k]
            gcols.append(col)
    if not etgt:
        return None
    return (np.array(etgt, np.int32), np.array(etch, np.int32),
            np.array(esrc, np.int32), np.stack(gcols, axis=1))


class QStreamBatchDecoder:
    """Whole-stream batched decode over the quantized wire format.

    Streams' frame-lane payloads are packed into one byte heap per batch;
    records index into it.  decode() uploads heap + records (both f32-viewed
    fast-path arrays) and runs the single-jit token-decode + frame-scan."""

    def __init__(self, streams, batch: int | None = None,
                 max_frames: int | None = None):
        from . import qwire
        infos = [dict() for _ in streams]
        parsed = [parse_stream_qwire(s, max_frames=max_frames,
                                     info_out=infos[i])
                  for i, s in enumerate(streams)]
        rate, nl, is34, ds = parsed[0][1:5]
        self.sample_rate, self.nl = rate, nl
        self.out_nl = infos[0]["out_nl"]
        self.is34, self.ds = is34, ds
        # pad shorter streams to the LONGEST with silence lanes — min()
        # would silently truncate audio (round-2 advisor finding)
        self.T = max(len(p[0]) for p in parsed)
        B = batch or len(parsed)
        L = B * nl
        heap = bytearray()
        recs = np.zeros((self.T, L, qwire.REC_W), np.int32)
        sil_payload, sil_rec = qwire.silence_lane()
        sil_rec = sil_rec.copy()
        sil_rec[qwire.R_TOKOFF] = len(heap)
        heap += sil_payload
        for b in range(B):
            fr = parsed[b % len(parsed)][0]
            for t in range(self.T):
                if t >= len(fr):
                    recs[t, b * nl:(b + 1) * nl] = sil_rec
                    continue
                for ln, (payload, rec) in enumerate(fr[t]):
                    r = rec.copy()
                    r[qwire.R_TOKOFF] = len(heap)
                    heap += payload
                    recs[t, b * nl + ln] = r
        if len(heap) % 4:
            heap += b"\0" * (4 - len(heap) % 4)
        self.S = max(64, int((recs[:, :, qwire.R_W1] & 0xFFFF).max()))
        self.S = -(-self.S // 64) * 64
        # static jit axes of the device spectral decode, keyed on mode-1
        # PRESENCE: a zero-spectrum spec lane (nbits==0, nsec>0) must
        # still route through the spec decoder, or its section-map bytes
        # get token-decoded as garbage
        sa = qwire.spec_static_args(recs)
        self.NB, self.MS = sa["NB"], sa["MS"]
        self.NS, self.SEC = sa["NS"], sa["SEC"]
        self.RP = qwire.rows_pair_static(heap, recs)
        self.rate_idx = parse_adts_header(
            BitReader(bytes(streams[0][:7]))).sampling_index
        self.heap_w = np.frombuffer(bytes(heap), np.float32)
        self.rec_w = recs.view(np.float32)
        self.L = L
        self._frames_total = sum(
            len(parsed[b % len(parsed)][0]) for b in range(B))
        # AFTER_IMDCT coupling edges, flattened into global lane indices
        self._couple = _flatten_couple(
            [infos[b % len(parsed)].get("couple") for b in range(B)],
            nl, self.T)

    def decode(self):
        import jax

        from .heaac_graph import (init_qwire_carry, qwire_scan_decoder,
                                  qwire_scan_decoder_couple)
        carry = init_qwire_carry(self.L)
        if self._couple is not None:
            run = qwire_scan_decoder_couple(self.is34, self.ds, self.S,
                                            self.rate_idx, self.NB,
                                            self.MS, self.NS, self.SEC,
                                            self.RP)
            etgt, etch, esrc, gains = self._couple
            _, pcm = run(jax.device_put(self.heap_w),
                         jax.device_put(self.rec_w), carry,
                         jax.device_put(etgt), jax.device_put(etch),
                         jax.device_put(esrc), jax.device_put(gains))
            return pcm
        run = qwire_scan_decoder(self.is34, self.ds, self.S,
                                 self.rate_idx, self.NB, self.MS, self.NS,
                                 self.SEC, self.RP)
        _, pcm = run(jax.device_put(self.heap_w),
                     jax.device_put(self.rec_w), carry)
        return pcm

    def audio_seconds(self) -> float:
        # real (non-padding) frames only — padded silence lanes don't count
        return self._frames_total * self.nl \
            * (1024 << (not self.ds)) / self.sample_rate


def decode_qwire_flip_stream(data: bytes,
                             max_frames: int | None = None) -> np.ndarray:
    """Decode one HE-AACv2 stream whose PS band mode (20<->34) flips
    mid-stream, on device, via the flip-capable scan graph.

    The per-frame mode rides side bit 6; the graph runs the PS stage in
    both band modes, selects per lane, and converts the carried PS state
    at each flip boundary (aacps.c:829-860) — so ONE compiled graph
    covers any flip schedule and these streams no longer demote to the
    ~100x-slower numpy single-stream path.  Returns int16 [n, 2]."""
    import jax

    from . import qwire
    from .heaac_graph import (init_qwire_flip_carry, qwire_scan_decoder_flip,
                              qwire_scan_decoder_flip_couple)

    is34_l: list = []
    info: dict = {}
    frames_q, _rate, nl, _, ds = parse_stream_qwire(
        data, max_frames=max_frames, is34_out=is34_l, info_out=info)
    T = len(frames_q)
    heap = bytearray()
    recs = np.zeros((T, nl, qwire.REC_W), np.int32)
    for t in range(T):
        for ln, (payload, rec) in enumerate(frames_q[t]):
            r = rec.copy()
            r[qwire.R_TOKOFF] = len(heap)
            heap += payload
            recs[t, ln] = r
    if len(heap) % 4:
        heap += b"\0" * (4 - len(heap) % 4)
    S = max(64, int((recs[:, :, qwire.R_W1] & 0xFFFF).max()))
    S = -(-S // 64) * 64
    sa = qwire.spec_static_args(recs)
    NB, NS, SEC = sa["NB"], sa["NS"], sa["SEC"]
    RP = qwire.rows_pair_static(heap, recs)
    rate_idx = parse_adts_header(BitReader(bytes(data[:7]))).sampling_index
    carry = init_qwire_flip_carry(nl)
    couple = _flatten_couple([info.get("couple")], nl, T)
    if couple is not None:
        # flips + AFTER_IMDCT CCE in the same stream: the flip scan keeps
        # float output and the coupling mixes at the output rate before
        # int16 rounding (aacdec.c:1919-1929)
        run = qwire_scan_decoder_flip_couple(ds, S, rate_idx, NB, NS, SEC,
                                             RP)
        etgt, etch, esrc, gains = couple
        _, pcm = run(jax.device_put(np.frombuffer(bytes(heap), np.float32)),
                     jax.device_put(recs.view(np.float32)), carry,
                     jax.device_put(etgt), jax.device_put(etch),
                     jax.device_put(esrc), jax.device_put(gains))
    else:
        run = qwire_scan_decoder_flip(ds, S, rate_idx, NB, NS, SEC, RP)
        _, pcm = run(jax.device_put(np.frombuffer(bytes(heap), np.float32)),
                     jax.device_put(recs.view(np.float32)), carry)
    pcm = np.asarray(pcm)            # [T, nl, 2, 2048|1024]
    out_nl = info.get("out_nl", nl)  # trailing CCE lanes are not output
    if out_nl == 1:
        return pcm[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    chans = [pcm[:, k, 0].reshape(-1) for k in range(out_nl)]
    return np.stack(chans, axis=-1)


def _count_adts_frames(data: bytes) -> int:
    """Header-only ADTS frame count (resynchronizing walk, no payload
    slicing)."""
    n = 0
    off = 0
    end = len(data)
    while off + 7 <= end:
        if data[off] != 0xFF or (data[off + 1] & 0xF6) != 0xF0:
            off += 1
            continue
        flen = ((data[off + 3] & 3) << 11) | (data[off + 4] << 3) \
            | (data[off + 5] >> 5)
        if flen < 7 or off + flen > end:
            break
        n += 1
        off += flen
    return n


class QwirePipelinedDecoder:
    """End-to-end pipelined batched decode over the quantized wire format.

    The native parser emits ~0.4-0.6 KB/frame-lane token/side/header blocks
    straight into double-buffered heap staging (codec/qwire.py); each
    finished stream group is device_put (two f32-viewed fast-path arrays)
    and its whole-stream scan dispatched asynchronously, so host parse of
    group g+1 overlaps device decode of group g and the wire stays ~14x
    smaller than the packed-record format — the lever that matters on the
    ~40-90 MB/s sustained axon tunnel."""

    def __init__(self, streams, group_streams: int = 256,
                 max_frames: int | None = None, token_cap: int = 640):
        from . import qwire
        self.qwire = qwire
        self.streams = [bytes(s) for s in streams]
        hdr = parse_adts_header(BitReader(self.streams[0][:7]))
        self.hdr = hdr
        self.G = min(group_streams, len(self.streams))
        info0: dict = {}
        frames0, rate, nl, is34, ds = parse_stream_qwire(
            self.streams[0], max_frames=max_frames, info_out=info0)
        # lane count comes from the parsed layout, not the header field
        # (configs 3-7 have more lanes than elements; config 0 none)
        self.nl = nl
        # output lanes (CCE coupling sources ride extra non-output lanes)
        self.out_nl = info0["out_nl"]
        counts = [_count_adts_frames(s) for s in self.streams]
        if max_frames is not None:
            counts = [min(c, max_frames) for c in counts]
        # T must cover the LONGEST stream (shorter ones pad with silence
        # lanes) — truncating to the first stream's length silently drops
        # audio (round-1 advisor finding)
        self.T = max_frames if max_frames is not None else max(counts)
        # length bucketing (round-2 verdict #9): parse/decode groups in
        # ascending frame-count order so a group's scan length is its own
        # longest stream (rounded up to 32 to bound recompiles), and one
        # long stream no longer taxes every other group's device time
        n = len(self.streams)
        self.order = sorted(range(n), key=lambda i: counts[i])
        self.group_of = {}
        self.slot_of = {}
        self.group_T = []
        G = self.G
        for g0 in range(0, n, G):
            idxs = self.order[g0:g0 + G]
            for slot, i in enumerate(idxs):
                self.group_of[i] = g0 // G
                self.slot_of[i] = slot
            tg = max(counts[i] for i in idxs)
            self.group_T.append(min(self.T, -(-max(tg, 1) // 32) * 32))
        self.sample_rate, self.is34, self.ds = rate, is34, ds
        self.S = token_cap
        self.NB = 0              # raw-bits window (grows per parsed group)
        self.MS = 0              # any device-M/S spec pairs seen so far
        self.NS = 52             # band-axis width (128 once shorts seen)
        self.SEC = 8             # section-axis width (grows per group)
        self.RP = 0              # any coupled-CPE raw-rows lanes seen
        self.rate_idx = hdr.sampling_index
        self.L = self.G * self.nl
        self.frame_counts: list = []
        self.error_count = 0     # corrupt frames (silenced lanes), total
        # silence template: recs rows default to a shared silence payload
        # at heap offset 0, so lanes/frames the parser does not write are
        # valid without any tail reset
        sil_payload, sil_rec = qwire.silence_lane()
        self._sil_payload = sil_payload
        self._sil_recs = np.broadcast_to(
            sil_rec, (self.T, self.L, qwire.REC_W)).copy()
        cap = len(sil_payload) + self.T * self.L * 1536
        cap += (-cap) % 4
        self._bufsets = [None, None]
        self._cap = cap
        self._upload_w = None   # fixed f32 upload length (set by group 0)
        self._cur_couple = None  # last-parsed group's AFTER_IMDCT edges

    def _buffers(self, bufset: int):
        if self._bufsets[bufset] is None:
            heap = np.zeros(self._cap, np.uint8)
            heap[:len(self._sil_payload)] = np.frombuffer(
                self._sil_payload, np.uint8)
            recs = self._sil_recs.copy()
            self._bufsets[bufset] = (heap, recs)
        return self._bufsets[bufset]

    def _grow(self):
        """Double the heap staging (raw-f32-heavy frames — whole-lane TNS
        — can exceed the ~0.5 KB/frame-lane sizing estimate).  Caller must
        have drained all in-flight uploads first."""
        from ..utils.metrics import log
        self._cap *= 2
        self._bufsets = [None, None]
        self._upload_w = None
        log.info("qwire pipelined decode: heap grown to %d KB",
                 self._cap >> 10)

    def _parse_group(self, group: list, bufset: int, T: int | None = None,
                     n_real: int | None = None):
        import ctypes as C

        from .. import native
        from ..utils.metrics import log
        qwire = self.qwire
        T = self.T if T is None else T
        heap, recs = self._buffers(bufset)
        recs[:T] = self._sil_recs[:T]
        cur = len(self._sil_payload)
        n_counts0 = len(self.frame_counts)
        err0 = self.error_count
        couples: list = [None] * len(group)   # per-slot AFTER_IMDCT edges
        self._cur_couple = None
        native_ok = native.available()
        if native_ok:
            # hoist ctypes marshaling out of the per-stream loop (the
            # wrapper's per-call conversions cost ~1 us/frame at B=2048)
            L = native.lib()
            fn = L.hh_parse_he_stream_qwire
            heap_p = heap.ctypes.data_as(C.POINTER(C.c_uint8))
            recs_p = recs.ctypes.data_as(C.POINTER(C.c_int32))
            info = np.zeros(8, np.int32)
            info_p = info.ctypes.data_as(C.POINTER(C.c_int32))
            cedges = np.zeros(native.EDGE_MAX * 3, np.int32)
            cgains = np.zeros((T, native.EDGE_MAX), np.float32)
            cedges_p = cedges.ctypes.data_as(C.POINTER(C.c_int32))
            cgains_p = cgains.ctypes.data_as(C.POINTER(C.c_float))
            edges_dirty = False
            cur_c = C.c_int64(cur)
            cur_ref = C.byref(cur_c)
            si, sr = self.hdr.sampling_index, self.hdr.sample_rate
            cc, stride = self.hdr.chan_config, recs.shape[1]
        for gi, data in enumerate(group):
            lane0 = gi * self.nl
            if native_ok:
                if edges_dirty:
                    # gains are written sparsely (only where a CCE is
                    # present); clear the previous stream's residue
                    cgains[:] = 0
                    edges_dirty = False
                nf = fn(data, len(data), si, sr, cc, heap_p, heap.nbytes,
                        cur_ref, recs_p, T, stride, lane0, info_p,
                        cedges_p, cgains_p, native.EDGE_MAX)
                if nf >= 0 and int(info[0]) != self.nl:
                    nf = -1  # layout mismatch: python fallback below
                if nf >= 0:
                    cur = int(cur_c.value)
                    if n_real is None or gi < n_real:
                        self.error_count += int(info[3])
                    ne = int(info[4])
                    if ne and (n_real is None or gi < n_real):
                        struct = [tuple(int(x) for x in
                                        cedges[k * 3:k * 3 + 3])
                                  for k in range(ne)]
                        couples[gi] = (struct, cgains[:nf, :ne].copy())
                    if ne:
                        edges_dirty = True
                    self.frame_counts.append(nf)
                    if nf < T:
                        recs[nf:T, lane0:lane0 + self.nl] = \
                            self._sil_recs[nf:T, lane0:lane0 + self.nl]
                    continue
                cur_c.value = cur  # rewind any partial native writes
                edges_dirty = True  # a bailed CCE parse may have written
                if nf == -3:      # heap overflow: grow + retry the group
                    del self.frame_counts[n_counts0:]
                    self.error_count = err0
                    return None
            log.info("qwire pipelined decode: stream %d fell back to the "
                     "Python planner", gi)
            errs: list = []
            # NOT named `info`: that would shadow the native path's i32
            # result array for the REST of the group (the later
            # `int(info[0])` layout check would read this dict)
            pinfo: dict = {}
            frames_q, rate2, nl2, is34_2, ds2 = parse_stream_qwire(
                data, max_frames=T, err_out=errs, info_out=pinfo)
            if n_real is None or gi < n_real:
                self.error_count += errs[0]
                couples[gi] = pinfo.get("couple")
            if (rate2, nl2, is34_2, ds2) != (self.sample_rate, self.nl,
                                             self.is34, self.ds):
                raise ValueError(
                    "stream %d profile (%s) differs from the batch profile "
                    "(%s) — route heterogeneous inputs through decode_batch"
                    % (gi, (rate2, nl2, is34_2, ds2),
                       (self.sample_rate, self.nl, self.is34, self.ds)))
            nf = len(frames_q)
            self.frame_counts.append(nf)
            for t in range(nf):
                for ln, (payload, rec) in enumerate(frames_q[t]):
                    if cur + len(payload) > heap.nbytes:
                        del self.frame_counts[n_counts0:]
                        self.error_count = err0
                        return None      # grow + retry
                    r2 = rec.copy()
                    r2[qwire.R_TOKOFF] = cur
                    heap[cur:cur + len(payload)] = np.frombuffer(
                        payload, np.uint8)
                    cur += len(payload)
                    recs[t, lane0 + ln] = r2
            if native_ok:
                cur_c.value = cur
        maxtok = int((recs[:T, :, qwire.R_W1] & 0xFFFF).max())
        if maxtok > self.S:   # pathological stream: widen + recompile
            self.S = -(-maxtok // 64) * 64
        # the static spectral-decode axes grow monotonically per group
        # (a growth recompiles the scan once)
        sa = qwire.spec_static_args(recs[:T])
        self.NB = max(self.NB, sa["NB"])
        self.MS = max(self.MS, sa["MS"])
        self.NS = max(self.NS, sa["NS"])
        self.SEC = max(self.SEC, sa["SEC"])
        self.RP = max(self.RP, qwire.rows_pair_static(heap[:cur], recs[:T]))
        self._cur_couple = _flatten_couple(couples, self.nl, T)
        return heap, cur, recs

    def decode(self):
        """Parse + upload + decode all streams, pipelined by group.

        The host parse of group g+1 overlaps BOTH the upload and the device
        decode of group g: device_put runs on a worker thread (the transfer
        and the native parse each release the GIL), which matters once the
        tunnel's per-process burst budget is spent and transfers drop to
        the ~45 MB/s sustained rate.

        Returns device pcm arrays [T, L, 2, 2048] (one per group); blocks
        until the last group is done."""
        from concurrent.futures import ThreadPoolExecutor

        import jax

        from .heaac_graph import (init_qwire_carry, qwire_scan_decoder,
                                  qwire_scan_decoder_couple)

        def upload_and_dispatch(heap, cur, recs, Tg, couple=None):
            if self._upload_w is None:
                self._upload_w = min((cur + 3) // 4 + 65536, self._cap // 4)
            while (cur + 3) // 4 > self._upload_w:  # grow (rare)
                self._upload_w = min(self._upload_w * 2, self._cap // 4)
            heap_w = heap[:self._upload_w * 4].view(np.float32)
            carry = init_qwire_carry(self.L)
            if couple is not None:
                run = qwire_scan_decoder_couple(self.is34, self.ds, self.S,
                                                self.rate_idx, self.NB,
                                                self.MS, self.NS, self.SEC,
                                                self.RP)
                etgt, etch, esrc, gains = couple
                _, pcm = run(jax.device_put(heap_w),
                             jax.device_put(recs[:Tg].view(np.float32)),
                             carry, jax.device_put(etgt),
                             jax.device_put(etch), jax.device_put(esrc),
                             jax.device_put(gains))
                return pcm
            run = qwire_scan_decoder(self.is34, self.ds, self.S,
                                     self.rate_idx, self.NB, self.MS,
                                     self.NS, self.SEC, self.RP)
            _, pcm = run(jax.device_put(heap_w),
                         jax.device_put(recs[:Tg].view(np.float32)), carry)
            return pcm

        outs = []
        n = len(self.streams)
        self.frame_counts = []
        self.error_count = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for gidx, g0 in enumerate(range(0, n, self.G)):
                idxs = self.order[g0:g0 + self.G]
                group = [self.streams[i] for i in idxs]
                n_real = len(group)
                if len(group) < self.G:
                    # pad with a stream from this group (keeps its T)
                    group = group + [group[0]] * (self.G - len(group))
                Tg = self.group_T[gidx]
                if gidx >= 2:
                    # staging set gidx%2 was read by group gidx-2: wait
                    # for its upload+decode before overwriting the arrays
                    jax.block_until_ready(futs[gidx - 2].result())
                for _ in range(6):
                    r = self._parse_group(group, gidx % 2, Tg, n_real)
                    if r is not None:
                        break
                    # heap overflow: drain every in-flight upload, then
                    # grow the staging buffers and retry this group
                    jax.block_until_ready([f.result() for f in futs])
                    self._grow()
                else:
                    raise MemoryError("qwire heap kept overflowing")
                heap, cur, recs = r
                futs.append(pool.submit(upload_and_dispatch, heap, cur,
                                        recs, Tg, self._cur_couple))
            outs = [f.result() for f in futs]
        jax.block_until_ready(outs[-1])
        # frame_counts were appended in sorted parse order; expose them in
        # the caller's original stream order
        by_orig = [0] * n
        for k, i in enumerate(self.order):
            by_orig[i] = self.frame_counts[k]
        self.frame_counts = by_orig
        return outs

    def audio_seconds(self) -> float:
        spf = 1024 << (not self.ds)
        return sum(fc * spf / self.sample_rate for fc in self.frame_counts)


# ---------------------------------------------------------------------------
# Device-resident stream decode: one scan over all frames
# ---------------------------------------------------------------------------
def _make_scan_decoder(is34: int = 0, downsampled: int = 0,
                       compact: bool = True):
    """jit of: scan the fused frame graph over T frames with the per-lane
    plan sequences resident on device (zero per-frame host traffic).  In
    compact mode the scanned plan leaves are the ~3 KB wire records,
    expanded to dense tensors inside the scan body."""
    import jax
    import jax.numpy as jnp

    from .heaac_graph import heaac_frame, heaac_frame_compact

    step = heaac_frame_compact if compact else heaac_frame

    def body(state, frame):
        core, sbr, ps = frame
        pcm, state = step(core, sbr, ps, state, is34, downsampled)
        pcm16 = jnp.clip(jnp.rint(pcm), -32768, 32767).astype(jnp.int16)
        return state, pcm16

    @jax.jit
    def run(core_seq, sbr_seq, ps_seq, state):
        state, pcm = jax.lax.scan(body, state, (core_seq, sbr_seq, ps_seq))
        return state, pcm  # pcm [T, B, 2, 2048] int16

    return run


def _pad_plan_frames(d: dict, defaults: dict, T: int, nl: int) -> dict:
    """Pad each [T_i, nl, ...] leaf to T frames with the per-key silence
    default (advisor fix: shorter streams must not truncate the batch)."""
    T_i = len(next(iter(d.values())))
    if T_i >= T:
        return {k: v[:T] for k, v in d.items()}
    out = {}
    for k, v in d.items():
        dv = np.asarray(defaults[k])
        pad = np.broadcast_to(dv, (T - T_i, nl) + dv.shape)
        out[k] = np.concatenate([np.asarray(v), pad], axis=0)
    return out


def _he_plan_defaults(compact: bool = False):
    core = dict(coeffs=np.zeros(1024, np.float32), ws=np.int32(0),
                wsp=np.int32(0), kbd=np.int32(0), kbdp=np.int32(0))
    if compact:
        return core, compact_plan.zeros_compact(), \
            compact_plan.zeros_ps_compact()
    zp = frame_plan._zeros_plan()
    sbr = {k: np.asarray(getattr(zp, k))
           for k in frame_plan.SbrChannelPlan.__dataclass_fields__}
    ps = frame_plan.build_ps_plan(None, 64)
    return core, sbr, ps


class StreamBatchDecoder:
    """Whole-stream batched decode with device-resident plans.

    Takes B streams (each lane genuinely distinct — one plan sequence per
    lane, shape [T, B, ...]), uploads once, then decodes all T frames for
    all B lanes in a single device dispatch (lax.scan over frames).
    Shorter streams are padded to the longest with silence plans; their
    true lengths are kept in ``frame_counts`` (one entry per batch slot)
    so callers can trim the decoded output per stream."""

    def __init__(self, streams, batch: int | None = None,
                 asc: bytes | None = None, max_frames: int | None = None,
                 compact: bool = True, _sharding=None):
        import jax

        if isinstance(streams, (bytes, bytearray)):
            streams = [bytes(streams)]
        self.compact = compact
        per = [parse_stream_plans(s, asc=asc, max_frames=max_frames,
                                  compact=compact)
               for s in streams]
        rate = per[0][3]
        self.lanes_per_stream = per[0][4]
        self.is34 = per[0][5]
        self.ds = per[0][6]
        if any(p[5] != self.is34 or p[6] != self.ds for p in per):
            raise NotImplementedError(
                "mixed PS band / synthesis modes in one batch")
        T = max(len(p[0]["coeffs"]) for p in per)
        n = len(per)
        B = batch or n  # B = number of streams; lanes = B * lanes_per_stream
        self.B, self.T, self.sample_rate = B, T, rate
        self.frame_counts = [len(per[i % n][0]["coeffs"]) for i in range(B)]

        dflt = _he_plan_defaults(compact)
        nl = self.lanes_per_stream
        padded = [tuple(_pad_plan_frames(p[idx], dflt[idx], T, nl)
                        for idx in range(3)) for p in per]

        def stack(idx):
            keys = padded[0][idx].keys()
            return {k: np.concatenate(
                [padded[i % n][idx][k] for i in range(B)], axis=1)
                    for k in keys}

        put = (jax.device_put if _sharding is None
               else lambda x: jax.device_put(x, _sharding))
        self.core = {k: put(v) for k, v in stack(0).items()}
        self.sbr = {k: put(v) for k, v in stack(1).items()}
        self.ps = {k: put(v) for k, v in stack(2).items()}
        self.run_fn = _make_scan_decoder(self.is34, self.ds, compact)

    def _init_state(self):
        lanes = self.B * self.lanes_per_stream
        return (init_compact_state(lanes) if self.compact
                else init_state(lanes))

    def decode(self):
        """Returns pcm [T, B*lanes_per_stream, 2, 2048] int16
        ([..., 1024] in downsampled mode)."""
        state, pcm = self.run_fn(self.core, self.sbr, self.ps,
                                 self._init_state())
        return pcm

    def audio_seconds(self) -> float:
        return self.B * self.T * (1024 << (not self.ds)) / self.sample_rate


# ---------------------------------------------------------------------------
# Pipelined end-to-end decode: host parse of group g+1 overlaps device
# decode of group g (SURVEY.md §2.5 host<->device pipelining)
# ---------------------------------------------------------------------------
def _silence_record() -> np.ndarray:
    """The packed wire record of a silence lane ([REC_W] f32)."""
    sc = compact_plan.zeros_compact()
    pc = compact_plan.zeros_ps_compact()
    meta = np.zeros((1, 1, 8), np.int32)
    return compact_plan.pack_records(
        meta, {k: v[None, None] for k, v in sc.items()},
        {k: v[None, None] for k, v in pc.items()})[0, 0]


def _make_packed_scan_decoder(is34: int = 0, downsampled: int = 0):
    """jit of: scan the fused frame graph over T frames with the plan
    sequences shipped as XOR-whitened packed f32 wire records
    [T, L, REC_W] (codec/compact_plan.py) — f32 is the only dtype with a
    fast path on the axon host->device tunnel, and whitening keeps the
    payload on that path (see compact_plan.whiten_masks)."""
    import jax
    import jax.numpy as jnp

    from .heaac_graph import heaac_frame_compact

    def body(state, frame):
        coeffs_w, rec_w, mask_c, mask_r = frame
        coeffs, rec = compact_plan.unwhiten_jax(coeffs_w, rec_w,
                                                mask_c, mask_r)
        meta, sc, pc = compact_plan.unpack_records_jax(rec)
        core = dict(coeffs=coeffs, **meta)
        pcm, state = heaac_frame_compact(core, sc, pc, state, is34,
                                         downsampled)
        pcm16 = jnp.clip(jnp.rint(pcm), -32768, 32767).astype(jnp.int16)
        return state, pcm16

    @jax.jit
    def run(coeffs_seq, rec_seq, mask_c, mask_r, state):
        state, pcm = jax.lax.scan(body, state,
                                  (coeffs_seq, rec_seq, mask_c, mask_r))
        return state, pcm

    return run


class PipelinedStreamBatchDecoder:
    """End-to-end batched decode where the host parses stream group g+1
    while the device decodes group g.

    The native parser writes each stream's lanes straight into the
    preallocated [T, L, ...] group tensors (strided C entry, zero-copy
    assembly); each finished group is device_put and its whole-stream
    scan dispatched asynchronously, so wall time approaches
    max(host parse, device decode) instead of their sum.  Streams must
    share one decode profile (rate / channel config / PS band mode) —
    heterogeneous inputs go through decode_batch's bucketing first."""

    def __init__(self, streams, group_streams: int = 256,
                 max_frames: int | None = None):
        self.streams = [bytes(s) for s in streams]
        hdr = parse_adts_header(BitReader(self.streams[0][:7]))
        self.hdr = hdr
        self.G = min(group_streams, len(self.streams))
        # discover lane count + frame count + SBR/PS mode from stream 0
        first = parse_stream_plans(self.streams[0], max_frames=max_frames,
                                   compact=True)
        self.nl = first[4]
        self.T = (len(first[0]["coeffs"]) if max_frames is None
                  else max_frames)
        self.sample_rate = first[3]
        self.is34 = first[5]
        self.ds = first[6]
        self.run_fn = _make_packed_scan_decoder(self.is34, self.ds)
        self.frame_counts: list = []
        L = self.G * self.nl
        # XOR-whitening masks (see compact_plan.whiten_masks); uploaded to
        # the device once — random data rides the tunnel's fast path
        self._mask_c, self._mask_r = compact_plan.whiten_masks(self.T, L)
        self._dev_masks = None
        # whitened silence record per (frame, lane) position, for buffer
        # prefill and tail resets
        sil = _silence_record().view(np.uint32)
        self._wh_sil = (self._mask_r ^ sil).view(np.float32)
        # double-buffered host staging: set s is reused for group g only
        # after group g-2 (which read from it) finished on device
        self._bufsets = [None, None]

    def _parse_group(self, group: list, bufset: int):
        from .. import native
        L = self.G * self.nl
        if self._bufsets[bufset] is None:
            coeffs = self._mask_c.copy().view(np.float32)   # whitened zeros
            rec = self._wh_sil.copy()
            self._bufsets[bufset] = (coeffs, rec)
        coeffs, rec = self._bufsets[bufset]
        native_ok = native.available()

        def reset_tail(sl, r):
            """Reused buffers: frames [r:T] of these lanes hold stale data
            from an earlier group -> restore (whitened) silence."""
            if r < self.T:
                coeffs.view(np.uint32)[r:, sl] = self._mask_c[r:, sl]
                rec[r:, sl] = self._wh_sil[r:, sl]

        for gi, data in enumerate(group):
            r = None
            if native_ok:
                r = native.parse_he_stream_packed_into(
                    data, self.hdr.sampling_index, self.hdr.sample_rate,
                    self.hdr.chan_config, coeffs, rec, gi * self.nl,
                    self.T, self._mask_c, self._mask_r)
                if r is not None and r[1]["lanes"] != self.nl:
                    r = None   # layout mismatch: python fallback
            if r is not None:
                self.frame_counts.append(r[0])
                reset_tail(slice(gi * self.nl, (gi + 1) * self.nl), r[0])
                continue
            # Python planner fallback (PCE/CCE/Main/...): pack into slices
            from ..utils.metrics import log
            log.info("pipelined decode: stream %d fell back to the Python "
                     "planner", gi)
            core, sbr, ps, _, nl, _, _ = parse_stream_plans(
                data, max_frames=self.T, compact=True)
            r0 = len(core["coeffs"])
            self.frame_counts.append(r0)
            sl = slice(gi * self.nl, gi * self.nl + nl)
            coeffs.view(np.uint32)[:r0, sl] = (
                core["coeffs"].view(np.uint32) ^ self._mask_c[:r0, sl])
            meta = np.zeros((r0, nl, 8), np.int32)
            for j, k in enumerate(("ws", "wsp", "kbd", "kbdp")):
                meta[:, :, j] = core[k]
            packed = compact_plan.pack_records(meta, sbr, ps)
            rec.view(np.uint32)[:r0, sl] = (
                packed.view(np.uint32) ^ self._mask_r[:r0, sl])
            reset_tail(sl, r0)
        return coeffs, rec

    def decode(self):
        """Parse + upload + decode all streams, pipelined by group.

        Returns a list of device pcm arrays [T, G*nl, 2, 2048] (one per
        group, in order); blocks until the last group is done."""
        import jax
        outs = []
        n = len(self.streams)
        self.frame_counts = []
        for gidx, g0 in enumerate(range(0, n, self.G)):
            group = self.streams[g0:g0 + self.G]
            if len(group) < self.G:  # pad the tail group to the jit shape
                group = group + self.streams[:self.G - len(group)]
            if gidx >= 2:
                # buffer set gidx%2 was read by group gidx-2: wait for that
                # group's decode before overwriting the staging arrays
                jax.block_until_ready(outs[gidx - 2])
            coeffs, rec = self._parse_group(group, gidx % 2)
            if self._dev_masks is None:
                self._dev_masks = (jax.device_put(self._mask_c),
                                   jax.device_put(self._mask_r))
            state = init_compact_state(self.G * self.nl)
            # two fast-path f32 transfers + async dispatch: the scan runs
            # while the next group parses on host
            _, pcm = self.run_fn(jax.device_put(coeffs),
                                 jax.device_put(rec),
                                 *self._dev_masks, state)
            outs.append(pcm)
        jax.block_until_ready(outs[-1])
        self.frame_counts = self.frame_counts[:n]
        return outs

    def audio_seconds(self) -> float:
        rate = self.sample_rate
        spf = 1024 << (not self.ds)
        return sum(fc * spf / rate for fc in self.frame_counts)


# ---------------------------------------------------------------------------
# Batched AAC-LC decode (no SBR): core graph scanned over frames
# ---------------------------------------------------------------------------
class LcPlanningDecoder(Decoder):
    """Parses an AAC-LC stream (mono or stereo) into per-frame core plans,
    one lane per output channel.  AFTER_IMDCT (point 3) CCE elements get
    their own extra lanes and per-frame mix edges (the device applies the
    time-domain coupling as a post-scan gather-add)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.frames_core = []
        self.frames_couple = []   # per frame: [(tgt_lane, src_lane, gain)]

    def _spectral_to_sample(self, present):
        _host_couple_and_tns(self, raise_point3=False)
        all_lanes = self.lanes + self.cce_lanes
        lane_index_of = {(l.elem_type, l.elem_id, l.ch): i
                         for i, l in enumerate(all_lanes)}
        self.frames_couple.append(_point3_edges(self, lane_index_of))
        lanes = []
        for lane in all_lanes:
            el = self.elements[(lane.elem_type, lane.elem_id)]
            cd = el.cur[lane.ch]
            lanes.append(cd)
        zeros = np.zeros(1024, np.float32)
        self.frames_core.append(dict(
            coeffs=np.stack([cd.coeffs if cd.coeffs is not None else zeros
                             for cd in lanes]),
            ws=np.array([cd.ics.window_sequence for cd in lanes], np.int32),
            wsp=np.array([cd.ics.window_sequence_prev for cd in lanes],
                         np.int32),
            kbd=np.array([cd.ics.use_kb_window for cd in lanes], np.int32),
            kbdp=np.array([cd.ics.use_kb_window_prev for cd in lanes],
                          np.int32)))
        return np.zeros((0, 1), np.int16)


def _make_lc_scan_decoder(couple: bool = False):
    """couple=True keeps the scan output float and applies the
    AFTER_IMDCT coupling mix (tgt += gain*src over lanes) before the
    int16 rounding — a single gather/scatter-add outside the scan
    (aacdec.c:1849-1862 on device)."""
    import jax
    import jax.numpy as jnp

    from .core import _consts as core_consts
    from .core import core_frame

    m2048, m256, bank = core_consts()

    def body(saved, c):
        out, saved = core_frame(c["coeffs"], saved, c["ws"], c["wsp"],
                                c["kbd"], c["kbdp"], m2048, m256, bank)
        if couple:
            return saved, out
        return saved, jnp.clip(jnp.rint(out), -32768, 32767).astype(jnp.int16)

    if not couple:
        @jax.jit
        def run(core_seq, saved):
            saved, pcm = jax.lax.scan(body, saved, core_seq)
            return saved, pcm  # [T, L, 1024] int16
        return run

    @jax.jit
    def run_couple(core_seq, saved, etgt, esrc, gains):
        saved, pcm = jax.lax.scan(body, saved, core_seq)
        add = gains[:, :, None] * pcm[:, esrc]          # [T, K, 1024]
        pcm = pcm.at[:, etgt].add(add)
        return saved, jnp.clip(jnp.rint(pcm), -32768,
                               32767).astype(jnp.int16)
    return run_couple


class LcStreamBatchDecoder:
    """Batched AAC-LC decode: B streams, each contributing its channel
    lanes; whole-stream scan with device-resident plans."""

    def __init__(self, streams, batch: int | None = None,
                 max_frames: int | None = None):
        import jax

        if isinstance(streams, (bytes, bytearray)):
            streams = [bytes(streams)]
        parsed = [self._parse_one(st, max_frames) for st in streams]
        n = len(parsed)
        B = batch or n
        self.sample_rate = parsed[0][1]
        self.channels = parsed[0][2]
        # streams with AFTER_IMDCT CCE carry extra (non-output) lanes
        self.lane_block = max(p[3] for p in parsed)
        T_ = max(len(p[0]["coeffs"]) for p in parsed)
        self.T, self.B = T_, B
        self.frame_counts = [len(parsed[i % n][0]["coeffs"])
                             for i in range(B)]

        dflt = dict(coeffs=np.zeros(1024, np.float32), ws=np.int32(0),
                    wsp=np.int32(0), kbd=np.int32(0), kbdp=np.int32(0))
        lb = self.lane_block

        def pad_lanes(d):
            out = {}
            for k, v in d.items():
                v = np.asarray(v)
                if v.shape[1] < lb:
                    dv = np.asarray(dflt[k])
                    pad = np.broadcast_to(
                        dv, (v.shape[0], lb - v.shape[1]) + dv.shape)
                    v = np.concatenate([v, pad], axis=1)
                out[k] = v
            return out

        padded = [_pad_plan_frames(pad_lanes(p[0]), dflt, T_, lb)
                  for p in parsed]

        def stack(key):
            return np.concatenate(
                [padded[i % n][key] for i in range(B)], axis=1)

        self.core = jax.device_put({k: stack(k)
                                    for k in parsed[0][0].keys()})
        # flatten per-stream coupling edges into global-lane arrays
        etgt, esrc, gcols = [], [], []
        for b in range(B):
            couple = parsed[b % n][4]
            if not couple:
                continue
            struct, gains = couple          # [(tgt,src)], [T_s, E]
            for k, (tg, sr) in enumerate(struct):
                etgt.append(b * lb + tg)
                esrc.append(b * lb + sr)
                col = np.zeros(T_, np.float32)
                col[:len(gains)] = gains[:, k]
                gcols.append(col)
        self._couple = None
        if etgt:
            self._couple = (np.array(etgt, np.int32),
                            np.array(esrc, np.int32),
                            np.stack(gcols, axis=1))
        self.run_fn = _make_lc_scan_decoder(couple=self._couple is not None)

    @staticmethod
    def _parse_one(st: bytes, max_frames: int | None = None):
        """-> (core dict with [T, lanes, ...] leaves, rate, channels,
        total_lanes, couple) where couple is None or
        ([(tgt, src)], gains [T, E]) for AFTER_IMDCT CCE streams.

        Fast path: the whole-stream native C++ parser (ht_parse_stream —
        ADTS framing + element loop + dequant + prediction + TNS in one
        call, LC and Main); Python planner fallback for PCE/CCE/SSR
        streams."""
        frames = split_adts_stream(st)
        if max_frames is not None:
            frames = frames[:max_frames]
        hdr = parse_adts_header(BitReader(frames[0][:7]))
        if hdr.chan_config and hdr.object_type in (1, 2):
            from .. import native
            if native.available():
                layout = T.CHANNEL_LAYOUT_MAP[hdr.chan_config]
                lanes = sum(2 if et == T.TYPE_CPE else 1 for et, _ in layout)
                r = native.parse_stream(st, hdr.sampling_index, layout,
                                        len(frames))
                if r is not None:
                    coeffs, meta = r
                    core = dict(
                        coeffs=coeffs,
                        ws=meta[..., 0].astype(np.int32),
                        wsp=meta[..., 1].astype(np.int32),
                        kbd=meta[..., 2].astype(np.int32),
                        kbdp=meta[..., 3].astype(np.int32))
                    return core, hdr.sample_rate, lanes, lanes, None
        dec = LcPlanningDecoder(adts_probe=frames[0][:7])
        for f in frames:
            dec.decode_frame(f)
        core = {k: np.stack([np.asarray(fc[k]) for fc in dec.frames_core])
                for k in dec.frames_core[0]}
        total = core["coeffs"].shape[1]
        couple = None
        if any(dec.frames_couple):
            # one edge structure for the whole stream (a structure change
            # mid-stream falls back to the single-stream decoder)
            struct = sorted({(tg, sr) for fr in dec.frames_couple
                             for (tg, sr, _) in fr})
            pos = {e: k for k, e in enumerate(struct)}
            gains = np.zeros((len(dec.frames_couple), len(struct)),
                             np.float32)
            for t, fr in enumerate(dec.frames_couple):
                for tg, sr, g in fr:
                    gains[t, pos[(tg, sr)]] = g
            couple = (struct, gains)
        return core, dec.sample_rate, dec.channels, total, couple

    def decode(self):
        """Returns pcm [T, B*lane_block, 1024] int16 (device array);
        audio channels are the first ``channels`` lanes of each stream's
        lane block (extra lanes carry CCE outputs)."""
        import jax.numpy as jnp

        saved = jnp.zeros((self.B * self.lane_block, 512), jnp.float32)
        if self._couple is not None:
            etgt, esrc, gains = self._couple
            _, pcm = self.run_fn(self.core, saved, jnp.asarray(etgt),
                                 jnp.asarray(esrc), jnp.asarray(gains))
        else:
            _, pcm = self.run_fn(self.core, saved)
        return pcm

    def audio_seconds(self) -> float:
        return self.B * self.T * 1024 / self.sample_rate


# ---------------------------------------------------------------------------
# Heterogeneous batch front door: bucket streams by decode profile
# ---------------------------------------------------------------------------
def decode_batch(streams: list) -> list:
    """Decode many streams of possibly different configurations.

    Streams are bucketed by (profile, sample rate, channel layout) — one
    compiled graph per bucket (SURVEY.md §7 "heterogeneous batches"); each
    bucket decodes in one batched device dispatch (34-band PS streams get
    their own bucket: the graph is compiled per band mode).  Falls back to
    the single-stream decoder for unparsable streams.  Returns
    [int16 [n, ch]] in input order.
    """
    from .. import native
    from ..bitstream.adts import parse_adts_header, probe_adts
    from ..bitstream.reader import BitReader
    from .decoder import Decoder

    from ..utils.metrics import log

    native_ok = native.available()
    streams = list(streams)
    buckets: dict = {}
    meta = []
    results_pre: dict = {}
    for i, data in enumerate(streams):
        if len(data) < 7 or data[0] != 0xFF or (data[1] & 0xF0) != 0xF0:
            # leading garbage: resync on the first real syncword like the
            # reference splitter (aac_ac3_parser.c:44-48 sync scan)
            frames = split_adts_stream(data)
            if not frames:
                log.warning("decode_batch: stream %d has no ADTS "
                            "syncword; returning empty", i)
                results_pre[i] = np.zeros((0, 1), np.int16)
                meta.append(None)
                continue
            data = b"".join(frames)
            streams[i] = data
        hdr = parse_adts_header(BitReader(data[:7]))
        # cheap probe: the native front-end length-walks two frames
        # (~10 us/stream); the Python full-decode probe is the fallback
        sbr_on = ps34 = None
        if native_ok and hdr.object_type in (1, 2) and hdr.chan_config <= 7:
            p = native.probe_he_stream(data, hdr.sampling_index,
                                       hdr.sample_rate, hdr.chan_config)
            if p is not None:
                sbr_on, ps34 = bool(p["sbr"]), bool(p["is34"])
        if sbr_on is None:
            probe = Decoder(adts_probe=data[:7])
            first = split_adts_stream(data)[0]
            try:
                probe.decode_frame(first)
                sbr_on = probe.m4ac.sbr == 1
                ps34 = any(el.sbr is not None and el.sbr.ps is not None
                           and el.sbr.ps.is34bands
                           for el in probe.elements.values())
            except Exception:
                sbr_on, ps34 = False, False
        kind = "he" if sbr_on else "lc"
        key = (kind, hdr.sampling_index, hdr.chan_config, int(ps34))
        buckets.setdefault(key, []).append(i)
        meta.append(key)

    results: list = [None] * len(streams)
    for i, r in results_pre.items():
        results[i] = r
    for key, idxs in buckets.items():
        _decode_bucket_retry(key, idxs, streams, results)
    return results


def _decode_bucket_retry(key, idxs, streams, results, depth: int = 0):
    """Decode one bucket; on failure bisect so one corrupt stream demotes
    only itself (not the whole bucket) to the single-stream path."""
    from ..utils.metrics import log
    from .decoder import Decoder

    group = [streams[i] for i in idxs]
    try:
        _decode_bucket(key[0], group, idxs, streams, results)
        return
    except Exception as exc:
        if len(idxs) == 1:
            if isinstance(exc, NotImplementedError) \
                    and "PS band mode" in str(exc):
                # mid-stream 20<->34 flip: decode on device through the
                # flip-capable scan instead of the numpy single-stream path
                try:
                    results[idxs[0]] = decode_qwire_flip_stream(
                        streams[idxs[0]])
                    log.info("decode_batch: stream %d decoded via the "
                             "PS band-mode-flip scan", idxs[0])
                    return
                except Exception as exc2:
                    log.warning(
                        "decode_batch: flip-scan decode of stream %d "
                        "failed (%s: %s); using the single-stream decoder",
                        idxs[0], type(exc2).__name__, exc2)
            log.warning(
                "decode_batch: stream %d fell back to the single-stream "
                "decoder: %s: %s", idxs[0], type(exc).__name__, exc)
            dec = Decoder(adts_probe=streams[idxs[0]][:7])
            results[idxs[0]] = dec.decode(streams[idxs[0]])
            return
        if depth == 0:
            log.warning(
                "decode_batch: bucket %s (%d streams) failed (%s: %s); "
                "bisecting to isolate the offender", key, len(idxs),
                type(exc).__name__, exc)
    mid = len(idxs) // 2
    _decode_bucket_retry(key, idxs[:mid], streams, results, depth + 1)
    _decode_bucket_retry(key, idxs[mid:], streams, results, depth + 1)


def _decode_bucket(kind, group, idxs, streams, results):
    from .decoder import Decoder
    if kind == "lc":
        bd = LcStreamBatchDecoder(group)
        pcm = np.asarray(bd.decode())       # [T, B*lane_block, 1024]
        ch, lb = bd.channels, bd.lane_block
        for j, i in enumerate(idxs):
            T_j = bd.frame_counts[j]
            lanes = pcm[:T_j, j * lb:j * lb + ch]    # [T_j, ch, 1024]
            results[i] = lanes.transpose(0, 2, 1).reshape(-1, ch)
    elif kind == "he":
        # the end-to-end qwire pipeline: native parse straight into the
        # wire heap, threaded upload overlap, grouped device scans
        bd = QwirePipelinedDecoder(group)
        outs = [np.asarray(o) for o in bd.decode()]
        lps = bd.out_nl                     # CCE lanes are non-output
        for j, i in enumerate(idxs):
            T_j = bd.frame_counts[j]
            # groups are length-bucketed: map through the sort permutation
            pcm = outs[bd.group_of[j]]
            lane0 = bd.slot_of[j] * bd.nl
            lanes = pcm[:T_j, lane0:lane0 + lps]
            if lps == 1:                     # mono->stereo (PS or dup)
                results[i] = lanes[:, 0].transpose(0, 2, 1).reshape(-1, 2)
            else:                            # CPE: one channel per lane
                chans = [lanes[:, k, 0].reshape(-1) for k in range(lps)]
                results[i] = np.stack(chans, axis=-1)
    else:
        for i in idxs:
            dec = Decoder(adts_probe=streams[i][:7])
            results[i] = dec.decode(streams[i])
