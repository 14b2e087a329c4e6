#!/usr/bin/env python3
"""Generate GIF conformance fixtures for GifSpec.

Encodes deterministic indexed rasters with the SYSTEM giflib
(/usr/lib/x86_64-linux-gnu/libgif.so.7, the reference GIF
implementation) and stores the .gif stream plus the logical index
raster(s) and palette(s) under src/test/resources/gif/. GifSpec then
decodes each .gif with the engine's pure-JVM RawGif decoder and
requires INDEX-EXACT raster equality (GIF is lossless) — an
independent-implementation conformance check.

Recipes cross every LZW width boundary (512/1024/2048/4096 with a
256-color noise raster that fills the table and forces giflib's
mid-stream clear), exercise the 2-color minimum-code-size path, long
smooth runs, INTERLACED row order, multi-frame animations with
graphic-control extensions (delay / transparency / disposal), local
color tables without a global one, and 1x1 / odd tiny sizes.
"""
import ctypes
import json
import os

LIB = '/usr/lib/x86_64-linux-gnu/libgif.so.7'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'test', 'resources', 'gif')

lib = ctypes.CDLL(LIB)

WRITE_FUNC = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)


class GifColorType(ctypes.Structure):
    _fields_ = [('Red', ctypes.c_ubyte), ('Green', ctypes.c_ubyte),
                ('Blue', ctypes.c_ubyte)]


lib.GifMakeMapObject.restype = ctypes.c_void_p
lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.POINTER(GifColorType)]
lib.EGifOpen.restype = ctypes.c_void_p
lib.EGifOpen.argtypes = [ctypes.c_void_p, WRITE_FUNC, ctypes.POINTER(ctypes.c_int)]
lib.EGifPutScreenDesc.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
lib.EGifPutImageDesc.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_bool,
                                 ctypes.c_void_p]
lib.EGifPutLine.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                            ctypes.c_int]
lib.EGifPutExtension.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_void_p]
lib.EGifCloseFile.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]

INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xffffffffffffffff

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) \
            & 0xffffffffffffffff
        return (self.s >> 33) & 0x7fffffff


def make_map(palette):
    colors = (GifColorType * len(palette))()
    for i, (r, g, b) in enumerate(palette):
        colors[i] = GifColorType(r, g, b)
    m = lib.GifMakeMapObject(len(palette), colors)
    assert m, 'GifMakeMapObject failed'
    return m


def encode(screen_w, screen_h, global_pal, frames):
    """frames: list of dicts {left, top, w, h, indices, pal (or None),
    interlace, gce (or None: dict delay_cs, trans, disposal)}."""
    chunks = []

    @WRITE_FUNC
    def writer(_f, buf, n):
        chunks.append(ctypes.string_at(buf, n))
        return n

    err = ctypes.c_int()
    f = lib.EGifOpen(None, writer, ctypes.byref(err))
    assert f, f'EGifOpen err {err.value}'
    gmap = make_map(global_pal) if global_pal else None
    assert lib.EGifPutScreenDesc(f, screen_w, screen_h, 8, 0, gmap) == 1

    for fr in frames:
        gce = fr.get('gce')
        if gce:
            flags = (gce['disposal'] << 2) | (1 if gce['trans'] >= 0 else 0)
            blk = bytes([flags, gce['delay_cs'] & 0xff,
                         (gce['delay_cs'] >> 8) & 0xff,
                         gce['trans'] if gce['trans'] >= 0 else 0])
            assert lib.EGifPutExtension(f, 0xf9, 4, blk) == 1
        lmap = make_map(fr['pal']) if fr.get('pal') else None
        assert lib.EGifPutImageDesc(f, fr['left'], fr['top'], fr['w'], fr['h'],
                                    fr.get('interlace', False), lmap) == 1
        w, h = fr['w'], fr['h']
        idx = fr['indices']
        rows = range(h)
        if fr.get('interlace', False):
            rows = [y for start, step in INTERLACE_PASSES
                    for y in range(start, h, step)]
        for y in rows:
            line = (ctypes.c_ubyte * w)(*idx[y * w:(y + 1) * w])
            assert lib.EGifPutLine(f, line, w) == 1
    assert lib.EGifCloseFile(f, ctypes.byref(err)) == 1, f'close err {err.value}'
    return b''.join(chunks)


def pal_n(n, seed):
    rng = Lcg(seed)
    return [(rng.next() % 256, rng.next() % 256, rng.next() % 256)
            for _ in range(n)]


def noise(w, h, ncolors, seed):
    rng = Lcg(seed)
    return bytes(rng.next() % ncolors for _ in range(w * h))


def smooth(w, h, ncolors):
    return bytes(((x // 7 + y // 5) % ncolors) for y in range(h) for x in range(w))


FIXTURES = []

FIXTURES.append(('pal2_bw', 33, 21, pal_n(2, 1), [
    {'left': 0, 'top': 0, 'w': 33, 'h': 21,
     'indices': bytes(((x + y) // 3) % 2 for y in range(21) for x in range(33))}]))
FIXTURES.append(('pal16_noise', 40, 30, pal_n(16, 2), [
    {'left': 0, 'top': 0, 'w': 40, 'h': 30, 'indices': noise(40, 30, 16, 3)}]))
FIXTURES.append(('pal256_noise', 128, 128, pal_n(256, 4), [
    {'left': 0, 'top': 0, 'w': 128, 'h': 128, 'indices': noise(128, 128, 256, 5)}]))
FIXTURES.append(('pal256_smooth', 100, 80, pal_n(256, 6), [
    {'left': 0, 'top': 0, 'w': 100, 'h': 80, 'indices': smooth(100, 80, 256)}]))
FIXTURES.append(('interlaced', 64, 64, pal_n(64, 7), [
    {'left': 0, 'top': 0, 'w': 64, 'h': 64, 'indices': noise(64, 64, 64, 8),
     'interlace': True}]))
FIXTURES.append(('frames3', 32, 32, pal_n(32, 9), [
    {'left': 0, 'top': 0, 'w': 32, 'h': 32, 'indices': noise(32, 32, 32, 10),
     'gce': {'delay_cs': 10, 'trans': -1, 'disposal': 1}},
    {'left': 4, 'top': 6, 'w': 20, 'h': 16, 'indices': noise(20, 16, 32, 11),
     'gce': {'delay_cs': 20, 'trans': 5, 'disposal': 2}},
    {'left': 0, 'top': 0, 'w': 32, 'h': 8, 'indices': smooth(32, 8, 32),
     'gce': {'delay_cs': 30, 'trans': 0, 'disposal': 3}}]))
FIXTURES.append(('localpal', 24, 18, None, [
    {'left': 0, 'top': 0, 'w': 24, 'h': 18, 'indices': noise(24, 18, 8, 12),
     'pal': pal_n(8, 13)},
    {'left': 2, 'top': 2, 'w': 16, 'h': 10, 'indices': noise(16, 10, 4, 14),
     'pal': pal_n(4, 15)}]))
FIXTURES.append(('tiny1x1', 1, 1, pal_n(2, 16), [
    {'left': 0, 'top': 0, 'w': 1, 'h': 1, 'indices': bytes([1])}]))
FIXTURES.append(('tiny3x2', 3, 2, pal_n(4, 17), [
    {'left': 0, 'top': 0, 'w': 3, 'h': 2, 'indices': bytes([0, 1, 2, 3, 2, 1])}]))

os.makedirs(OUT, exist_ok=True)
meta = {}
for name, sw, sh, gpal, frames in FIXTURES:
    data = encode(sw, sh, gpal, frames)
    with open(os.path.join(OUT, name + '.gif'), 'wb') as f:
        f.write(data)
    raster = b''.join(fr['indices'] for fr in frames)
    with open(os.path.join(OUT, name + '.idx'), 'wb') as f:
        f.write(raster)
    # effective palette per frame (local if present, else global), RGB triples
    pals = b''.join(bytes([c for rgb in (fr.get('pal') or gpal) for c in rgb])
                    for fr in frames)
    with open(os.path.join(OUT, name + '.pal'), 'wb') as f:
        f.write(pals)
    meta[name] = {
        'screen': [sw, sh],
        'global_pal': gpal,
        'frames': [{k: fr.get(k) for k in
                    ('left', 'top', 'w', 'h', 'interlace', 'gce', 'pal')}
                   for fr in frames],
    }
    print(f'{name}: {sw}x{sh}, {len(frames)} frame(s), {len(data)} bytes')

with open(os.path.join(OUT, 'meta.json'), 'w') as f:
    json.dump(meta, f, indent=1, sort_keys=True)
print('wrote', OUT)
