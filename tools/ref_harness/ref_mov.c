/* Reference MP4/M4A oracle harness (libavformat mov.c / movenc.c).
 *
 * Usage:
 *   ref_mov demux in.m4a asc.bin frames.bin
 *       open with the reference demuxer; write the AAC extradata
 *       (AudioSpecificConfig from the esds atom, mov.c:494) to asc.bin
 *       and every packet to frames.bin as [u32le len][bytes]*.
 *   ref_mov mux in.aac out.m4a
 *       read an ADTS stream, run the aac_adtstoasc bitstream filter
 *       (aac_adtstoasc_bsf.c) and write an .m4a with the mov muxer
 *       (movenc.c), i.e. the exact reference path that produces the
 *       files our demuxer must accept. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libavformat/avformat.h"

static int adts_frame_len(const unsigned char *p, long avail) {
    if (avail < 7) return -1;
    if (p[0] != 0xff || (p[1] & 0xf6) != 0xf0) return -1;
    int len = ((p[3] & 0x03) << 11) | (p[4] << 3) | (p[5] >> 5);
    if (len < 7 || len > avail) return -1;
    return len;
}

static int do_demux(const char *in, const char *asc_out,
                    const char *frames_out) {
    AVFormatContext *ic = NULL;
    if (av_open_input_file(&ic, in, NULL, 0, NULL) < 0) {
        fprintf(stderr, "open %s failed\n", in);
        return 2;
    }
    if (av_find_stream_info(ic) < 0) return 3;
    int audio = -1;
    for (unsigned i = 0; i < ic->nb_streams; i++)
        if (ic->streams[i]->codec->codec_type == AVMEDIA_TYPE_AUDIO) {
            audio = i;
            break;
        }
    if (audio < 0) { fprintf(stderr, "no audio stream\n"); return 4; }
    AVCodecContext *c = ic->streams[audio]->codec;
    FILE *fa = fopen(asc_out, "wb");
    fwrite(c->extradata, 1, c->extradata_size, fa);
    fclose(fa);
    fprintf(stderr, "codec_id=%d rate=%d ch=%d extradata=%d\n",
            c->codec_id, c->sample_rate, c->channels, c->extradata_size);

    FILE *ff = fopen(frames_out, "wb");
    AVPacket pkt;
    while (av_read_frame(ic, &pkt) >= 0) {
        if (pkt.stream_index == audio) {
            unsigned char hdr[4] = {pkt.size & 255, (pkt.size >> 8) & 255,
                                    (pkt.size >> 16) & 255,
                                    (pkt.size >> 24) & 255};
            fwrite(hdr, 1, 4, ff);
            fwrite(pkt.data, 1, pkt.size, ff);
        }
        av_free_packet(&pkt);
    }
    fclose(ff);
    av_close_input_file(ic);
    return 0;
}

static int do_mux(const char *in, const char *out) {
    FILE *fi = fopen(in, "rb");
    if (!fi) return 2;
    fseek(fi, 0, SEEK_END);
    long sz = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    unsigned char *buf = malloc(sz + FF_INPUT_BUFFER_PADDING_SIZE);
    if (fread(buf, 1, sz, fi) != (size_t)sz) return 2;
    memset(buf + sz, 0, FF_INPUT_BUFFER_PADDING_SIZE);
    fclose(fi);

    int rate_idx = (buf[2] >> 2) & 0xF, chan = ((buf[2] & 1) << 2) | (buf[3] >> 6);
    static const int rates[] = {96000, 88200, 64000, 48000, 44100, 32000,
                                24000, 22050, 16000, 12000, 11025, 8000,
                                7350,  0,     0,     0};

    AVOutputFormat *fmt = av_guess_format("ipod", out, NULL);
    if (!fmt) fmt = av_guess_format("mp4", out, NULL);
    if (!fmt) { fprintf(stderr, "no mp4 muxer\n"); return 5; }
    AVFormatContext *oc = avformat_alloc_context();
    oc->oformat = fmt;
    snprintf(oc->filename, sizeof(oc->filename), "%s", out);
    AVStream *st = av_new_stream(oc, 0);
    AVCodecContext *c = st->codec;
    c->codec_type = AVMEDIA_TYPE_AUDIO;
    c->codec_id = CODEC_ID_AAC;
    c->sample_rate = rates[rate_idx];
    c->channels = chan;
    c->frame_size = 1024;
    st->time_base = (AVRational){1, c->sample_rate};
    if (av_set_parameters(oc, NULL) < 0) return 6;
    if (url_fopen(&oc->pb, out, URL_WRONLY) < 0) return 7;

    AVBitStreamFilterContext *bsf =
        av_bitstream_filter_init("aac_adtstoasc");
    if (!bsf) { fprintf(stderr, "no adtstoasc bsf\n"); return 8; }

    int wrote_header = 0;
    long pos = 0;
    int64_t pts = 0;
    while (pos < sz) {
        int flen = adts_frame_len(buf + pos, sz - pos);
        if (flen < 0) { pos++; continue; }
        AVPacket pkt;
        av_init_packet(&pkt);
        pkt.data = buf + pos;
        pkt.size = flen;
        uint8_t *od = NULL;
        int osz = 0;
        int r = av_bitstream_filter_filter(bsf, c, NULL, &od, &osz,
                                           pkt.data, pkt.size, 0);
        if (r < 0) { fprintf(stderr, "bsf failed\n"); return 9; }
        if (!wrote_header) {
            if (av_write_header(oc) < 0) return 10;
            wrote_header = 1;
        }
        pkt.data = od;
        pkt.size = osz;
        pkt.pts = pkt.dts = pts;
        pkt.duration = 1024;
        pkt.stream_index = 0;
        pts += 1024;
        if (av_interleaved_write_frame(oc, &pkt) < 0) return 11;
        if (r > 0) av_free(od);
        pos += flen;
    }
    av_write_trailer(oc);
    url_fclose(oc->pb);
    av_bitstream_filter_close(bsf);
    return 0;
}

int main(int argc, char **argv) {
    av_register_all();
    if (argc == 5 && !strcmp(argv[1], "demux"))
        return do_demux(argv[2], argv[3], argv[4]);
    if (argc == 4 && !strcmp(argv[1], "mux"))
        return do_mux(argv[2], argv[3]);
    fprintf(stderr,
            "usage: %s demux in.m4a asc.bin frames.bin | mux in.aac out.m4a\n",
            argv[0]);
    return 1;
}
