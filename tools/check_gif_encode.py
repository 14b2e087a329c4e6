#!/usr/bin/env python3
"""Decode RawGif-encoded streams with the REFERENCE giflib and assert
index-raster + palette equality against the goldens dumped next to
them — the encoder half of the GIF conformance loop.

Usage:
  sbt -batch 'runMain graft.tools.GifDump /tmp/gif_out'
  python3 tools/check_gif_encode.py /tmp/gif_out
"""
import ctypes
import glob
import os
import sys

LIB = '/usr/lib/x86_64-linux-gnu/libgif.so.7'
lib = ctypes.CDLL(LIB)

READ_FUNC = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)


class GifColorType(ctypes.Structure):
    _fields_ = [('Red', ctypes.c_ubyte), ('Green', ctypes.c_ubyte),
                ('Blue', ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [('ColorCount', ctypes.c_int), ('BitsPerPixel', ctypes.c_int),
                ('SortFlag', ctypes.c_bool),
                ('Colors', ctypes.POINTER(GifColorType))]


class GifImageDesc(ctypes.Structure):
    _fields_ = [('Left', ctypes.c_int), ('Top', ctypes.c_int),
                ('Width', ctypes.c_int), ('Height', ctypes.c_int),
                ('Interlace', ctypes.c_bool),
                ('ColorMap', ctypes.POINTER(ColorMapObject))]


class SavedImage(ctypes.Structure):
    _fields_ = [('ImageDesc', GifImageDesc),
                ('RasterBits', ctypes.POINTER(ctypes.c_ubyte)),
                ('ExtensionBlockCount', ctypes.c_int),
                ('ExtensionBlocks', ctypes.c_void_p)]


class GifFileType(ctypes.Structure):
    _fields_ = [('SWidth', ctypes.c_int), ('SHeight', ctypes.c_int),
                ('SColorResolution', ctypes.c_int),
                ('SBackGroundColor', ctypes.c_int),
                ('AspectByte', ctypes.c_ubyte),
                ('SColorMap', ctypes.POINTER(ColorMapObject)),
                ('ImageCount', ctypes.c_int),
                ('Image', GifImageDesc),
                ('SavedImages', ctypes.POINTER(SavedImage)),
                ('ExtensionBlockCount', ctypes.c_int),
                ('ExtensionBlocks', ctypes.c_void_p),
                ('Error', ctypes.c_int),
                ('UserData', ctypes.c_void_p),
                ('Private', ctypes.c_void_p)]


lib.DGifOpen.restype = ctypes.POINTER(GifFileType)
lib.DGifOpen.argtypes = [ctypes.c_void_p, READ_FUNC, ctypes.POINTER(ctypes.c_int)]
lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
lib.DGifCloseFile.argtypes = [ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_int)]


def decode(data):
    state = {'pos': 0}

    @READ_FUNC
    def reader(_f, buf, n):
        p = state['pos']
        chunk = data[p:p + n]
        ctypes.memmove(buf, chunk, len(chunk))
        state['pos'] = p + len(chunk)
        return len(chunk)

    err = ctypes.c_int()
    f = lib.DGifOpen(None, reader, ctypes.byref(err))
    assert f, f'DGifOpen err {err.value}'
    assert lib.DGifSlurp(f) == 1, f'DGifSlurp err {f.contents.Error}'
    g = f.contents
    frames = []
    for i in range(g.ImageCount):
        si = g.SavedImages[i]
        d = si.ImageDesc
        raster = ctypes.string_at(si.RasterBits, d.Width * d.Height)
        cmap = d.ColorMap if d.ColorMap else g.SColorMap
        pal = b''.join(bytes([cmap.contents.Colors[j].Red,
                              cmap.contents.Colors[j].Green,
                              cmap.contents.Colors[j].Blue])
                       for j in range(cmap.contents.ColorCount))
        frames.append((d.Width, d.Height, raster, pal))
    lib.DGifCloseFile(f, ctypes.byref(err))
    return g.SWidth, g.SHeight, frames


def main(d):
    ok = fail = 0
    for gp in sorted(glob.glob(os.path.join(d, '*.gif'))):
        name = os.path.basename(gp)[:-4]
        data = open(gp, 'rb').read()
        want_idx = open(os.path.join(d, name + '.idx'), 'rb').read()
        want_pal = open(os.path.join(d, name + '.pal'), 'rb').read()
        try:
            sw, sh, frames = decode(data)
        except AssertionError as e:
            print(f'FAIL {name}: giflib refused the stream ({e})')
            fail += 1
            continue
        (w, h, raster, pal) = frames[0]
        if raster == want_idx and pal == want_pal:
            print(f'OK   {name} ({w}x{h}, {len(data)} bytes)')
            ok += 1
        else:
            what = 'raster' if raster != want_idx else 'palette'
            print(f'FAIL {name}: {what} mismatch')
            fail += 1
    print(f'== {ok} ok, {fail} fail')
    return 1 if fail else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1]))
