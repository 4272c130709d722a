/* Reference AAC-LC encoder harness: s16le PCM in, ADTS out (for generating
 * conformance test streams; the reference has no SBR/PS encoder).
 * Usage: ref_encode in.pcm sample_rate channels bitrate out.aac */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libavcodec/avcodec.h"

static void write_adts(FILE *f, int aot, int sr_index, int ch, int len) {
    int full = len + 7;
    unsigned char h[7];
    h[0] = 0xff;
    h[1] = 0xf1;                      /* MPEG-4, no CRC */
    h[2] = ((aot - 1) << 6) | (sr_index << 2) | (ch >> 2);
    h[3] = ((ch & 3) << 6) | (full >> 11);
    h[4] = (full >> 3) & 0xff;
    h[5] = ((full & 7) << 5) | 0x1f;
    h[6] = 0xfc;
    fwrite(h, 1, 7, f);
}

static const int rates[13] = {96000,88200,64000,48000,44100,32000,24000,
                              22050,16000,12000,11025,8000,7350};

int main(int argc, char **argv) {
    if (argc < 6) return 1;
    avcodec_register_all();
    int sample_rate = atoi(argv[2]);
    int channels = atoi(argv[3]);
    int bitrate = atoi(argv[4]);
    int sr_index = -1;
    for (int i = 0; i < 13; i++) if (rates[i] == sample_rate) sr_index = i;
    if (sr_index < 0) return 2;

    AVCodec *codec = avcodec_find_encoder(CODEC_ID_AAC);
    AVCodecContext *c = avcodec_alloc_context();
    c->sample_rate = sample_rate;
    c->channels = channels;
    c->bit_rate = bitrate;
    c->sample_fmt = SAMPLE_FMT_S16;
    c->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (avcodec_open(c, codec) < 0) { fprintf(stderr, "enc open failed\n"); return 3; }

    FILE *fi = fopen(argv[1], "rb");
    FILE *fo = fopen(argv[5], "wb");
    if (!fi || !fo) return 4;
    int frame_bytes = 1024 * channels * 2;
    int16_t *pcm = calloc(1, frame_bytes);
    unsigned char *out = malloc(FF_MIN_BUFFER_SIZE * 8);
    size_t got;
    /* AAC encoder has one frame delay: feed frames, then flush once. */
    while ((got = fread(pcm, 1, frame_bytes, fi)) > 0) {
        memset((char *)pcm + got, 0, frame_bytes - got);
        int n = avcodec_encode_audio(c, out, FF_MIN_BUFFER_SIZE * 8, pcm);
        if (n > 0) { write_adts(fo, 2, sr_index, channels, n); fwrite(out, 1, n, fo); }
        if (got < (size_t)frame_bytes) break;
    }
    int n = avcodec_encode_audio(c, out, FF_MIN_BUFFER_SIZE * 8, pcm);
    if (n > 0) { write_adts(fo, 2, sr_index, channels, n); fwrite(out, 1, n, fo); }
    fclose(fo);
    return 0;
}
