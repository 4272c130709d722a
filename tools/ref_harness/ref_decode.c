/* Reference AAC decoder harness: ADTS bytes in, s16le PCM out.
 * Usage: ref_decode in.aac out.pcm
 * Mirrors the canonical api-example.c decode loop, but frames input with the
 * ADTS frame length so each avcodec_decode_audio3 call gets one frame. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libavcodec/avcodec.h"

static int adts_frame_len(const unsigned char *p, long avail) {
    if (avail < 7) return -1;
    if (p[0] != 0xff || (p[1] & 0xf6) != 0xf0) return -1;
    int len = ((p[3] & 0x03) << 11) | (p[4] << 3) | (p[5] >> 5);
    if (len < 7 || len > avail) return -1;
    return len;
}

static int hexval(char ch) {
    if (ch >= '0' && ch <= '9') return ch - '0';
    if (ch >= 'a' && ch <= 'f') return ch - 'a' + 10;
    if (ch >= 'A' && ch <= 'F') return ch - 'A' + 10;
    return -1;
}

int main(int argc, char **argv) {
    if (argc < 3) return 1;
    avcodec_register_all();
    AVCodec *codec = avcodec_find_decoder(CODEC_ID_AAC);
    AVCodecContext *c = avcodec_alloc_context();
    int strip_adts = 0;
    if (argc > 3) {
        /* argv[3] = AudioSpecificConfig hex; input stays ADTS-framed but
         * headers are stripped before each packet (explicit signaling) */
        size_t n = strlen(argv[3]) / 2;
        uint8_t *ed = av_mallocz(n + FF_INPUT_BUFFER_PADDING_SIZE);
        for (size_t i = 0; i < n; i++)
            ed[i] = (hexval(argv[3][2*i]) << 4) | hexval(argv[3][2*i+1]);
        c->extradata = ed;
        c->extradata_size = n;
        strip_adts = 1;
    }
    if (avcodec_open(c, codec) < 0) return 2;

    FILE *fi = fopen(argv[1], "rb");
    FILE *fo = fopen(argv[2], "wb");
    if (!fi || !fo) return 3;
    fseek(fi, 0, SEEK_END);
    long sz = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    unsigned char *buf = malloc(sz + FF_INPUT_BUFFER_PADDING_SIZE);
    if (fread(buf, 1, sz, fi) != (size_t)sz) return 4;
    memset(buf + sz, 0, FF_INPUT_BUFFER_PADDING_SIZE);

    int16_t *pcm = malloc(AVCODEC_MAX_AUDIO_FRAME_SIZE);
    long pos = 0;
    while (pos < sz) {
        int flen = adts_frame_len(buf + pos, sz - pos);
        if (flen < 0) { pos++; continue; }
        AVPacket pkt;
        av_init_packet(&pkt);
        pkt.data = buf + pos + (strip_adts ? 7 : 0);
        pkt.size = flen - (strip_adts ? 7 : 0);
        int out_size = AVCODEC_MAX_AUDIO_FRAME_SIZE;
        int used = avcodec_decode_audio3(c, pcm, &out_size, &pkt);
        if (used < 0) {
            fprintf(stderr, "decode error at %ld\n", pos);
            pos += flen;
            continue;
        }
        if (out_size > 0) fwrite(pcm, 1, out_size, fo);
        pos += flen;
    }
    fclose(fo);
    fprintf(stderr, "sample_rate=%d channels=%d\n", c->sample_rate, c->channels);
    return 0;
}
