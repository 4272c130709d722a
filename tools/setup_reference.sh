#!/bin/sh
# Build the reference (oracle) libs + validation harnesses out-of-tree.
# Idempotent; safe to re-run.  Used by tests/conftest.py fixtures.
set -e
TOOLS_DIR=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
REFBUILD=${REFBUILD:-/tmp/refbuild}
if [ ! -f "$REFBUILD/config.mak" ]; then
    mkdir -p "$REFBUILD"
    cd "$REFBUILD"
    "$REF/configure" --disable-asm --disable-yasm --disable-debug \
        --disable-doc --disable-network --disable-devices \
        --disable-ffserver --disable-ffplay --disable-ffprobe \
        --disable-swscale --disable-avfilter \
        --extra-cflags="-fcommon -fgnu89-inline -O2 -Wno-implicit-function-declaration -Wno-incompatible-pointer-types -Wno-int-conversion" \
        > configure.log 2>&1
fi
cd "$REFBUILD"
make -j"$(nproc)" libavcodec/libavcodec.a libavutil/libavutil.a > build.log 2>&1
REF="$REF" REFBUILD="$REFBUILD" sh "$TOOLS_DIR/ref_harness/build.sh"
