#!/usr/bin/env python3
"""Decode RawWebp-encoded streams with the REFERENCE libwebp and assert
pixel equality against the raw RGB rasters dumped next to them — the
encoder half of the WebP conformance loop.

Usage:
  sbt -batch 'runMain graft.tools.WebpDump /tmp/webp_out'
  python3 tools/check_webp_encode.py /tmp/webp_out
"""
import ctypes, os, sys, glob

lib = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def main(d):
    ok = fail = 0
    for wp in sorted(glob.glob(os.path.join(d, '*.webp'))):
        name = os.path.basename(wp)[:-5]
        data = open(wp, 'rb').read()
        want = open(os.path.join(d, name + '.rgb'), 'rb').read()
        W, H = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGB(data, len(data), ctypes.byref(W), ctypes.byref(H))
        if not p:
            print(f'FAIL {name}: libwebp refused the stream')
            fail += 1
            continue
        got = ctypes.string_at(p, W.value * H.value * 3)
        if got == want:
            print(f'OK   {name} ({W.value}x{H.value}, {len(data)} bytes)')
            ok += 1
        else:
            bad = next(i for i in range(len(want)) if got[i] != want[i])
            print(f'FAIL {name}: first byte diff at {bad}')
            fail += 1
    print(f'== {ok} ok, {fail} fail')
    return 1 if fail else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1]))
