/* Decode an ADTS stream and dump per-frame SBR internal state of the first
 * channel element, for stage-by-stage validation of the TPU SBR pipeline.
 * Usage: ref_sbr_dump in.aac dump.bin
 * Per frame writes: kx[2] m[2] (int32), bw_array[5], f_indexnoise,
 * f_indexsine (int32), W[1] (32*32*2), X_low (32*40*2), X_high (64*40*2),
 * e_origmapped/q_mapped/e_curr/gain/q_m/s_m (7*48 each), Y[1] (38*64*2),
 * X[2][38][64] -- all float32. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libavcodec/avcodec.h"
#include "libavcodec/aac.h"

static int adts_frame_len(const unsigned char *p, long avail) {
    if (avail < 7) return -1;
    if (p[0] != 0xff || (p[1] & 0xf6) != 0xf0) return -1;
    int len = ((p[3] & 0x03) << 11) | (p[4] << 3) | (p[5] >> 5);
    if (len < 7 || len > avail) return -1;
    return len;
}

static void dump_i32(FILE *f, const int *v, int n) { fwrite(v, 4, n, f); }
static void dump_f32(FILE *f, const float *v, int n) { fwrite(v, 4, n, f); }

int main(int argc, char **argv) {
    if (argc < 3) return 1;
    avcodec_register_all();
    AVCodec *codec = avcodec_find_decoder(CODEC_ID_AAC);
    AVCodecContext *c = avcodec_alloc_context();
    if (avcodec_open(c, codec) < 0) return 2;

    FILE *fi = fopen(argv[1], "rb");
    FILE *fo = fopen(argv[2], "wb");
    FILE *fpcm = argc > 3 ? fopen(argv[3], "wb") : NULL;
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
        pkt.data = buf + pos;
        pkt.size = flen;
        int out_size = AVCODEC_MAX_AUDIO_FRAME_SIZE;
        if (avcodec_decode_audio3(c, pcm, &out_size, &pkt) < 0) {
            fprintf(stderr, "decode error at %ld\n", pos);
        } else {
            if (fpcm && out_size > 0) fwrite(pcm, 1, out_size, fpcm);
            AACContext *ac = c->priv_data;
            ChannelElement *che = NULL;
            int t, i;
            for (t = 0; t < 4 && !che; t++)
                for (i = 0; i < MAX_ELEM_ID && !che; i++)
                    if (ac->che[t][i]) che = ac->che[t][i];
            if (che) {
                SpectralBandReplication *sbr = &che->sbr;
                int ints[8] = { sbr->kx[0], sbr->kx[1], sbr->m[0], sbr->m[1],
                                sbr->data[0].f_indexnoise,
                                sbr->data[0].f_indexsine,
                                sbr->data[0].e_a[0], sbr->data[0].e_a[1] };
                dump_i32(fo, ints, 8);
                dump_f32(fo, sbr->data[0].bw_array, 5);
                dump_f32(fo, &sbr->alpha0[0][0], 64*2);
                dump_f32(fo, &sbr->alpha1[0][0], 64*2);
                dump_f32(fo, &sbr->data[0].W[1][0][0][0], 32*32*2);
                dump_f32(fo, &sbr->X_low[0][0][0], 32*40*2);
                dump_f32(fo, &sbr->X_high[0][0][0], 64*40*2);
                dump_f32(fo, &sbr->e_origmapped[0][0], 7*48);
                dump_f32(fo, &sbr->q_mapped[0][0], 7*48);
                dump_f32(fo, &sbr->e_curr[0][0], 7*48);
                dump_f32(fo, &sbr->gain[0][0], 7*48);
                dump_f32(fo, &sbr->q_m[0][0], 7*48);
                dump_f32(fo, &sbr->s_m[0][0], 7*48);
                dump_f32(fo, &sbr->data[0].Y[1][0][0][0], 38*64*2);
                dump_f32(fo, &sbr->X[0][0][0][0], 2*38*64);
                {
                    int gi[5] = { sbr->data[0].bs_num_env,
                                  sbr->data[0].bs_frame_class,
                                  sbr->data[0].bs_num_noise,
                                  sbr->data[0].bs_amp_res, sbr->start };
                    int te[8], tq[3], fr[7];
                    for (i = 0; i < 8; i++) te[i] = sbr->data[0].t_env[i];
                    for (i = 0; i < 3; i++) tq[i] = sbr->data[0].t_q[i];
                    for (i = 0; i < 7; i++) fr[i] = sbr->data[0].bs_freq_res[i];
                    dump_i32(fo, gi, 5);
                    dump_i32(fo, te, 8);
                    dump_i32(fo, tq, 3);
                    dump_i32(fo, fr, 7);
                    dump_f32(fo, &sbr->data[0].env_facs[0][0], 6*48);
                    dump_f32(fo, &sbr->data[0].noise_facs[0][0], 3*5);
                    {
                        int vo = sbr->data[0].synthesis_filterbank_samples_offset;
                        dump_i32(fo, &vo, 1);
                        dump_f32(fo, sbr->data[0].synthesis_filterbank_samples, 2304);
                    }
                }
            }
        }
        pos += flen;
    }
    fclose(fo);
    return 0;
}
