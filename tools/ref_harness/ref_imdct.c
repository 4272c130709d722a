/* Dump reference ff_imdct_half outputs for validation of the TPU matrices.
 * Usage: ref_imdct <nbits> <scale> < input.f32 > output.f32
 * Reads N/2 float32, writes N/2 float32. */
#include <stdio.h>
#include <stdlib.h>
#include "libavcodec/fft.h"
#include "libavutil/mem.h"

int main(int argc, char **argv) {
    if (argc < 3) return 1;
    int nbits = atoi(argv[1]);
    double scale = atof(argv[2]);
    int n2 = 1 << (nbits - 1);
    FFTContext ctx;
    if (ff_mdct_init(&ctx, nbits, 1, scale)) return 2;
    float *in = av_malloc(sizeof(float) * n2);
    float *out = av_malloc(sizeof(float) * n2);
    if (fread(in, sizeof(float), n2, stdin) != (size_t)n2) return 3;
    ff_imdct_half(&ctx, out, in);
    fwrite(out, sizeof(float), n2, stdout);
    return 0;
}
