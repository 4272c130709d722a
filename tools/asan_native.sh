#!/bin/sh
# AddressSanitizer sweep over the native host front-end: builds an ASan
# .so and drives every parser path (bench streams, CPE M/S + intensity,
# EIGHT_SHORT, all three CCE coupling points, a 40-trial corruption
# storm) through QwirePipelinedDecoder._parse_group.  JAX stays on CPU;
# no device decode — this isolates the C++ layer.
#
#   sh tools/asan_native.sh        # expect final line: ASAN CLEAN
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
SO=/tmp/libaachost_asan.so
g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -ffp-contract=off \
    -fno-math-errno -fPIC -shared -std=c++17 \
    -o "$SO" "$REPO/heaac_tpu/native/aac_host.cc" 2>/dev/null
ASAN_LIB=$(g++ -print-file-name=libasan.so)
LD_PRELOAD=$ASAN_LIB ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
PYTHONPATH="$REPO:$PYTHONPATH" HEAAC_ASAN_SO="$SO" \
python "$REPO/tools/asan_harness.py"
