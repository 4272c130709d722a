#!/bin/sh
# Build the reference-linked validation harnesses.
# Requires the reference static libs built in $REFBUILD (see BASELINE.md).
set -e
REF=${REF:-/root/reference}
REFBUILD=${REFBUILD:-/tmp/refbuild}
OUT=${OUT:-/tmp/refbuild/harness}
mkdir -p "$OUT"
CFLAGS="-O2 -fcommon -fgnu89-inline -I$REF -I$REFBUILD"
LIBS="$REFBUILD/libavcodec/libavcodec.a $REFBUILD/libavutil/libavutil.a -lm -lz"
HERE=$(dirname "$0")
gcc $CFLAGS -o "$OUT/ref_imdct" "$HERE/ref_imdct.c" $LIBS
gcc $CFLAGS -o "$OUT/ref_decode" "$HERE/ref_decode.c" $LIBS
gcc $CFLAGS -o "$OUT/ref_encode" "$HERE/ref_encode.c" $LIBS
gcc $CFLAGS -o "$OUT/ref_sbr_dump" "$HERE/ref_sbr_dump.c" $LIBS
# MP4/M4A oracle needs the container layer too
if [ ! -f "$REFBUILD/libavformat/libavformat.a" ]; then
    (cd "$REFBUILD" && make -j"$(nproc)" libavformat/libavformat.a \
        > lavf_build.log 2>&1)
fi
gcc $CFLAGS -o "$OUT/ref_mov" "$HERE/ref_mov.c" \
    "$REFBUILD/libavformat/libavformat.a" $LIBS
echo "built: $OUT/ref_imdct $OUT/ref_decode $OUT/ref_encode $OUT/ref_sbr_dump $OUT/ref_mov"
