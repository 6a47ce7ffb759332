#!/bin/sh
# Build the reference ffmpeg (ffvvc) out-of-tree into .refbuild/ for the
# MD5-parity test matrix (tests/conftest.py REF_FFMPEG) and bench.py's
# vs_baseline.  /root/reference is read-only; everything lands in
# $ROOT/.refbuild (gitignored, rebuilt on demand).
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="$ROOT/.refbuild"
REF="${REF_SRC:-/root/reference}"
if [ -x "$BUILD/ffmpeg" ]; then
    echo "already built: $BUILD/ffmpeg"
    exit 0
fi
mkdir -p "$BUILD"
cd "$BUILD"
"$REF/configure" \
    --disable-x86asm \
    --disable-doc --disable-autodetect --disable-network \
    --disable-everything --disable-ffplay \
    --enable-decoder=vvc --enable-parser=vvc \
    --enable-demuxer=vvc,mov \
    --enable-muxer=md5,framemd5,framecrc,rawvideo,mp4,mov,null \
    --enable-protocol=file,pipe \
    --enable-bsf=vvc_mp4toannexb,vvc_metadata \
    --enable-filter=scale,format \
    --enable-encoder=rawvideo,wrapped_avframe
make -j"$(nproc)" ffmpeg ffprobe
echo "built: $BUILD/ffmpeg"
