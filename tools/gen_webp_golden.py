#!/usr/bin/env python3
"""Generate WebP-lossless conformance fixtures for WebpSpec.

Encodes deterministic RGBA rasters with the SYSTEM libwebp
(/usr/lib/x86_64-linux-gnu/libwebp.so.7, the reference WebP
implementation) and stores both the .webp stream and the raw RGBA dump
under src/test/resources/webp/. WebpSpec then decodes each .webp with
the engine's pure-JVM RawWebp decoder and requires byte-exact RGBA
equality — an independent-implementation conformance check (the
fixtures are produced by libwebp, not by the code under test).

Content recipes are chosen so libwebp's encoder picks every VP8L
feature across the set: palette (color-indexing) with every pixel-
bundling width, predictor + cross-color transforms, subtract-green,
color cache, LZ77 back-references and meta prefix-code (huffman)
images. Deterministic (fixed LCG), so re-running reproduces the same
bytes with the same libwebp build.
"""
import ctypes, os, sys, json

LIB = '/usr/lib/x86_64-linux-gnu/libwebp.so.7'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'test', 'resources', 'webp')

lib = ctypes.CDLL(LIB)
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xffffffffffffffff

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) \
            & 0xffffffffffffffff
        return (self.s >> 33) & 0x7fffffff


def raster(w, h, f):
    b = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r, g, bl, a = f(x, y)
            i = (y * w + x) * 4
            b[i:i+4] = bytes([r & 255, g & 255, bl & 255, a & 255])
    return bytes(b)


def noise(seed):
    rng = Lcg(seed)
    return lambda x, y: (rng.next(), rng.next(), rng.next(), 255)


def noise_alpha(seed):
    rng = Lcg(seed)
    return lambda x, y: (rng.next(), rng.next(), rng.next(),
                         rng.next() & 255)


FIXTURES = [
    # name, w, h, pixel fn — chosen per the module docstring
    ('g01_1x1', 1, 1, lambda x, y: (201, 17, 93, 255)),
    ('g02_flat', 4, 4, lambda x, y: (10, 200, 30, 255)),
    ('g03_checker2', 16, 16,
     lambda x, y: (255, 255, 255, 255) if (x + y) % 2 == 0
     else (0, 0, 0, 255)),                      # 2 colors: 8px/byte bundle
    ('g04_hgrad', 32, 32, lambda x, y: (x * 8, x * 8, x * 8, 255)),
    ('g05_noise', 64, 64, noise(5)),
    ('g06_odd_alpha', 33, 9, noise_alpha(6)),
    ('g07_pal8', 16, 16,
     lambda x, y: [(i * 31 % 256, i * 67 % 256, i * 13 % 256, 255)
                   for i in [((x // 2) + y) % 8]][0]),  # 8 colors: 1px bundle? (<=16 -> 2px/byte)
    ('g08_pal3', 8, 2,
     lambda x, y: [(40, 0, 0, 255), (0, 40, 0, 255),
                   (0, 0, 40, 255)][(x + y) % 3]),       # 3 colors: 4px/byte
    ('g09_pal2', 5, 5,
     lambda x, y: (9, 9, 9, 255) if x == y else (250, 250, 250, 255)),
    ('g10_smooth', 48, 48,
     lambda x, y: (x * 3 + y, (x + y) * 2, 255 - x - y * 2, 255)),
    ('g11_row', 256, 1, lambda x, y: (x, 255 - x, x ^ 170, 255)),
    ('g12_col', 1, 256, lambda x, y: (y, y // 2, 255 - y, 255)),
    ('g13_photoish', 128, 128,
     lambda x, y: (int(128 + 127 * __import__('math').sin(x / 7.0)),
                   int(128 + 127 * __import__('math').sin(y / 11.0)),
                   int(128 + 127 * __import__('math').sin((x + y) / 5.0)),
                   255)),
    ('g14_alphagrad', 17, 17,
     lambda x, y: (200, 100, 50, min(255, x * 16))),
    ('g15_big', 300, 200,
     lambda x, y: ((x * y) % 256, (x + 3 * y) % 256, (x * 7 ^ y) % 256,
                   255)),
    ('g16_runs', 90, 30,
     lambda x, y: (17, 34, 51, 255) if (x // 30 + y // 10) % 2 == 0
     else (204, 170, 136, 255)),                 # long same-pixel runs -> LZ77
]


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    for name, w, h, f in FIXTURES:
        rgba = raster(w, h, f)
        out = ctypes.c_void_p()
        n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
        assert n > 0, name
        buf = ctypes.string_at(out.value, n)
        # the golden is libwebp's own DECODE of the stream (not the input
        # raster): WebPEncodeLosslessRGBA defaults to exact=false, which
        # may rewrite RGB under fully-transparent pixels. The conformance
        # contract is decoder-vs-decoder equality on the same bytes.
        W, H = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGBA(buf, n, ctypes.byref(W), ctypes.byref(H))
        assert (W.value, H.value) == (w, h), name
        dec = ctypes.string_at(p, w * h * 4)
        with open(os.path.join(OUT, name + '.webp'), 'wb') as fh:
            fh.write(buf)
        with open(os.path.join(OUT, name + '.rgba'), 'wb') as fh:
            fh.write(dec)
        manifest.append({'name': name, 'w': w, 'h': h, 'webp_bytes': n})
        print(f'{name}: {w}x{h} -> {n} bytes')
    with open(os.path.join(OUT, 'manifest.json'), 'w') as fh:
        json.dump(manifest, fh, indent=1)


if __name__ == '__main__':
    main()
