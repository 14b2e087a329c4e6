#!/usr/bin/env python3
"""Decode RawVp8Enc-encoded lossy streams with the REFERENCE libwebp
and assert Y/U/V plane equality against the exact rasters dumped next
to them — the encoder half of the VP8 conformance loop. (The rasters
are 4x4-block-constant, for which the DC-only encoder is lossless, so
the planes ARE the normative decode output.)

Usage:
  sbt -batch 'runMain graft.tools.Vp8Dump /tmp/vp8_out'
  python3 tools/check_vp8_encode.py /tmp/vp8_out
"""
import ctypes
import glob
import os
import sys

lib = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def main(d):
    ok = fail = 0
    for wp in sorted(glob.glob(os.path.join(d, '*.webp'))):
        name = os.path.basename(wp)[:-5]
        data = open(wp, 'rb').read()
        want = open(os.path.join(d, name + '.yuv'), 'rb').read()
        w = ctypes.c_int()
        h = ctypes.c_int()
        u = ctypes.POINTER(ctypes.c_ubyte)()
        v = ctypes.POINTER(ctypes.c_ubyte)()
        st = ctypes.c_int()
        ust = ctypes.c_int()
        y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                              ctypes.byref(u), ctypes.byref(v),
                              ctypes.byref(st), ctypes.byref(ust))
        if not y:
            print(f'FAIL {name}: libwebp refused the stream')
            fail += 1
            continue
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        got = b''.join(ctypes.string_at(ctypes.addressof(y.contents)
                                        + r * st.value, W) for r in range(H))
        got += b''.join(ctypes.string_at(ctypes.addressof(u.contents)
                                         + r * ust.value, cw) for r in range(ch))
        got += b''.join(ctypes.string_at(ctypes.addressof(v.contents)
                                         + r * ust.value, cw) for r in range(ch))
        if got == want:
            print(f'OK   {name} ({W}x{H}, {len(data)} bytes)')
            ok += 1
        else:
            bad = next(i for i in range(len(want)) if got[i] != want[i])
            print(f'FAIL {name}: first byte diff at {bad} '
                  f'(got {got[bad]}, want {want[bad]})')
            fail += 1
    print(f'== {ok} ok, {fail} fail')
    return 1 if fail else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1]))
