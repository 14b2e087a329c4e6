#!/usr/bin/env python3
"""Generate lossy-WebP (VP8) conformance fixtures for Vp8Spec.

Encodes deterministic RGBA rasters with the SYSTEM libwebp
(/usr/lib/x86_64-linux-gnu/libwebp.so.7, the reference WebP
implementation) using the LOSSY encoder, then decodes each stream back
with libwebp's own WebPDecodeYUV and stores both the .webp bytes and
the raw Y/U/V planes under src/test/resources/vp8/. Vp8Spec then
decodes each .webp with the engine's pure-JVM RawVp8 decoder and
requires BYTE-EXACT Y/U/V equality — VP8 reconstruction (bool decoder,
dequant, iDCT/iWHT, intra prediction, loop filter) is fully
integer-specified by RFC 6386, so the YUV planes are bit-exact across
conforming decoders (unlike RGB output, whose 4:2:0 upsampling is
implementation-defined).

Content recipes target decoder features: flat color (DC prediction,
EOB-heavy), hard gradients (TM/V/H 16x16 modes), dense noise (B_PRED
4x4 modes, high-category coefficient tokens), non-MB-aligned crops,
multi-segment quantization (libwebp's default config uses 4 segments),
and quality extremes (quantizer index sweep). Deterministic (fixed
LCG) so re-running reproduces the same bytes with the same libwebp.
"""
import ctypes
import json
import os
import struct

LIB = '/usr/lib/x86_64-linux-gnu/libwebp.so.7'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'test', 'resources', 'vp8')

lib = ctypes.CDLL(LIB)
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xffffffffffffffff

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) \
            & 0xffffffffffffffff
        return (self.s >> 33) & 0x7fffffff


def encode(rgba, w, h, quality):
    out = ctypes.c_void_p()
    size = lib.WebPEncodeRGBA(bytes(rgba), w, h, w * 4,
                              ctypes.c_float(quality), ctypes.byref(out))
    assert size > 0, 'encode failed'
    data = ctypes.string_at(out.value, size)
    lib.WebPFree(out)
    return data


def decode_yuv(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, 'decode failed'
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = b''.join(ctypes.string_at(ctypes.addressof(y.contents)
                                   + r * stride.value, W) for r in range(H))
    up = b''.join(ctypes.string_at(ctypes.addressof(u.contents)
                                   + r * uv_stride.value, cw) for r in range(ch))
    vp = b''.join(ctypes.string_at(ctypes.addressof(v.contents)
                                   + r * uv_stride.value, cw) for r in range(ch))
    lib.WebPFree(y)
    return W, H, yp, up, vp


def decode_yuv_nofilter(data):
    """Advanced-API decode with bypass_filtering=1 — reconstruction-only
    goldens that isolate loop-filter bugs from prediction/token bugs."""
    # WebPDecoderConfig = WebPBitstreamFeatures (10 ints) +
    #   WebPDecBuffer (colorspace,w,h,is_external + union(64B) + pad[4] + ptr)
    #   + WebPDecoderOptions (14 ints + pad[5])
    class Features(ctypes.Structure):
        _fields_ = [('width', ctypes.c_int), ('height', ctypes.c_int),
                    ('has_alpha', ctypes.c_int), ('has_animation', ctypes.c_int),
                    ('format', ctypes.c_int), ('pad', ctypes.c_uint32 * 5)]

    class Yuva(ctypes.Structure):
        _fields_ = [('y', ctypes.POINTER(ctypes.c_ubyte)),
                    ('u', ctypes.POINTER(ctypes.c_ubyte)),
                    ('v', ctypes.POINTER(ctypes.c_ubyte)),
                    ('a', ctypes.POINTER(ctypes.c_ubyte)),
                    ('y_stride', ctypes.c_int),
                    ('u_stride', ctypes.c_int), ('v_stride', ctypes.c_int),
                    ('a_stride', ctypes.c_int),
                    ('y_size', ctypes.c_size_t), ('u_size', ctypes.c_size_t),
                    ('v_size', ctypes.c_size_t), ('a_size', ctypes.c_size_t)]

    class BufUnion(ctypes.Union):
        _fields_ = [('YUVA', Yuva), ('pad_bytes', ctypes.c_ubyte * 80)]

    class DecBuffer(ctypes.Structure):
        _fields_ = [('colorspace', ctypes.c_int), ('width', ctypes.c_int),
                    ('height', ctypes.c_int), ('is_external_memory', ctypes.c_int),
                    ('u', BufUnion), ('pad', ctypes.c_uint32 * 4),
                    ('private_memory', ctypes.c_void_p)]

    class Options(ctypes.Structure):
        _fields_ = [('bypass_filtering', ctypes.c_int),
                    ('no_fancy_upsampling', ctypes.c_int),
                    ('use_cropping', ctypes.c_int),
                    ('crop_left', ctypes.c_int), ('crop_top', ctypes.c_int),
                    ('crop_width', ctypes.c_int), ('crop_height', ctypes.c_int),
                    ('use_scaling', ctypes.c_int),
                    ('scaled_width', ctypes.c_int), ('scaled_height', ctypes.c_int),
                    ('use_threads', ctypes.c_int),
                    ('dithering_strength', ctypes.c_int),
                    ('flip', ctypes.c_int),
                    ('alpha_dithering_strength', ctypes.c_int),
                    ('pad', ctypes.c_uint32 * 5)]

    class Config(ctypes.Structure):
        _fields_ = [('input', Features), ('output', DecBuffer),
                    ('options', Options)]

    cfg = Config()
    assert lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), 0x0209) == 1
    cfg.options.bypass_filtering = 1
    cfg.output.colorspace = 11  # MODE_YUV
    lib.WebPDecode.restype = ctypes.c_int
    rc = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert rc == 0, f'WebPDecode rc={rc}'
    W, H = cfg.output.width, cfg.output.height
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yb = cfg.output.u.YUVA
    yp = b''.join(ctypes.string_at(ctypes.addressof(yb.y.contents)
                                   + r * yb.y_stride, W) for r in range(H))
    up = b''.join(ctypes.string_at(ctypes.addressof(yb.u.contents)
                                   + r * yb.u_stride, cw) for r in range(ch))
    vp = b''.join(ctypes.string_at(ctypes.addressof(yb.v.contents)
                                   + r * yb.v_stride, cw) for r in range(ch))
    lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return W, H, yp, up, vp


def encode_cfg(rgba, w, h, quality, **overrides):
    """Full-config lossy encode (WebPConfig + WebPPicture + memory
    writer) — reaches surfaces WebPEncodeRGBA's default config never
    emits: multiple token partitions, the simple loop filter, high
    sharpness, filter-off, single-segment."""
    class Config(ctypes.Structure):
        _fields_ = [('lossless', ctypes.c_int), ('quality', ctypes.c_float),
                    ('method', ctypes.c_int), ('image_hint', ctypes.c_int),
                    ('target_size', ctypes.c_int), ('target_PSNR', ctypes.c_float),
                    ('segments', ctypes.c_int), ('sns_strength', ctypes.c_int),
                    ('filter_strength', ctypes.c_int), ('filter_sharpness', ctypes.c_int),
                    ('filter_type', ctypes.c_int), ('autofilter', ctypes.c_int),
                    ('alpha_compression', ctypes.c_int), ('alpha_filtering', ctypes.c_int),
                    ('alpha_quality', ctypes.c_int), ('pass_', ctypes.c_int),
                    ('show_compressed', ctypes.c_int), ('preprocessing', ctypes.c_int),
                    ('partitions', ctypes.c_int), ('partition_limit', ctypes.c_int),
                    ('emulate_jpeg_size', ctypes.c_int), ('thread_level', ctypes.c_int),
                    ('low_memory', ctypes.c_int), ('near_lossless', ctypes.c_int),
                    ('exact', ctypes.c_int), ('use_delta_palette', ctypes.c_int),
                    ('use_sharp_yuv', ctypes.c_int),
                    ('qmin', ctypes.c_int), ('qmax', ctypes.c_int)]

    class Picture(ctypes.Structure):
        _fields_ = [('use_argb', ctypes.c_int), ('colorspace', ctypes.c_int),
                    ('width', ctypes.c_int), ('height', ctypes.c_int),
                    ('y', ctypes.c_void_p), ('u', ctypes.c_void_p), ('v', ctypes.c_void_p),
                    ('y_stride', ctypes.c_int), ('uv_stride', ctypes.c_int),
                    ('a', ctypes.c_void_p), ('a_stride', ctypes.c_int),
                    ('pad1', ctypes.c_uint32 * 2),
                    ('argb', ctypes.c_void_p), ('argb_stride', ctypes.c_int),
                    ('pad2', ctypes.c_uint32 * 3),
                    ('writer', ctypes.c_void_p), ('custom_ptr', ctypes.c_void_p),
                    ('extra_info_type', ctypes.c_int), ('extra_info', ctypes.c_void_p),
                    ('stats', ctypes.c_void_p), ('error_code', ctypes.c_int),
                    ('progress_hook', ctypes.c_void_p), ('user_data', ctypes.c_void_p),
                    ('pad3', ctypes.c_uint32 * 3),
                    ('pad4', ctypes.c_void_p), ('pad5', ctypes.c_void_p),
                    ('pad6', ctypes.c_uint32 * 8)]

    class MemWriter(ctypes.Structure):
        _fields_ = [('mem', ctypes.c_void_p), ('size', ctypes.c_size_t),
                    ('max_size', ctypes.c_size_t), ('pad', ctypes.c_uint32 * 1)]

    ABI = 0x020f
    cfg = Config()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(quality), ABI) == 1
    for k, v in overrides.items():
        setattr(cfg, k, v)
    assert lib.WebPValidateConfig(ctypes.byref(cfg)) == 1, f'bad config {overrides}'

    pic = Picture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI) == 1
    pic.width = w
    pic.height = h
    pic.use_argb = 1
    assert lib.WebPPictureImportRGBA(ctypes.byref(pic), bytes(rgba), w * 4) == 1

    wrt = MemWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wrt))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wrt), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok == 1, f'encode failed (error {pic.error_code}) for {overrides}'
    data = ctypes.string_at(wrt.mem, wrt.size)
    lib.WebPMemoryWriterClear(ctypes.byref(wrt))
    lib.WebPPictureFree(ctypes.byref(pic))
    return data


def raster_flat(w, h, rgb):
    px = bytes(list(rgb) + [255])
    return bytearray(px * (w * h))


def raster_blocks(w, h, seed, block):
    rng = Lcg(seed)
    colors = [(rng.next() % 256, rng.next() % 256, rng.next() % 256)
              for _ in range(64)]
    buf = bytearray(w * h * 4)
    for yy in range(h):
        for xx in range(w):
            c = colors[((yy // block) * 8 + (xx // block)) % 64]
            i = (yy * w + xx) * 4
            buf[i:i + 4] = bytes([c[0], c[1], c[2], 255])
    return buf


def raster_gradient(w, h):
    buf = bytearray(w * h * 4)
    for yy in range(h):
        for xx in range(w):
            i = (yy * w + xx) * 4
            buf[i] = (xx * 255) // max(1, w - 1)
            buf[i + 1] = (yy * 255) // max(1, h - 1)
            buf[i + 2] = ((xx + yy) * 255) // max(1, w + h - 2)
            buf[i + 3] = 255
    return buf


def raster_noise(w, h, seed):
    rng = Lcg(seed)
    buf = bytearray(w * h * 4)
    for i in range(w * h):
        buf[i * 4] = rng.next() % 256
        buf[i * 4 + 1] = rng.next() % 256
        buf[i * 4 + 2] = rng.next() % 256
        buf[i * 4 + 3] = 255
    return buf


def raster_mixed(w, h, seed):
    """Smooth background with sharp LCG-seeded rectangles + noise strip —
    drives the encoder into a mix of 16x16 and B_PRED macroblocks."""
    rng = Lcg(seed)
    buf = raster_gradient(w, h)
    for _ in range(10):
        x0 = rng.next() % w
        y0 = rng.next() % h
        bw = 4 + rng.next() % 24
        bh = 4 + rng.next() % 24
        c = (rng.next() % 256, rng.next() % 256, rng.next() % 256)
        for yy in range(y0, min(h, y0 + bh)):
            for xx in range(x0, min(w, x0 + bw)):
                i = (yy * w + xx) * 4
                buf[i:i + 3] = bytes(c)
    for yy in range(max(0, h - 8), h):
        for xx in range(w):
            i = (yy * w + xx) * 4
            buf[i] = rng.next() % 256
            buf[i + 1] = rng.next() % 256
            buf[i + 2] = rng.next() % 256
    return buf


FIXTURES = [
    ('flat16', raster_flat(16, 16, (200, 60, 60)), 16, 16, 75.0),
    ('flat_multi', raster_blocks(64, 48, 7, 16), 64, 48, 75.0),
    ('gradient', raster_gradient(80, 48), 80, 48, 80.0),
    ('noise', raster_noise(48, 48, 11), 48, 48, 50.0),
    ('crop', raster_mixed(75, 37, 13), 75, 37, 60.0),
    ('bigsmooth', raster_gradient(320, 192), 320, 192, 85.0),
    ('noise_q5', raster_noise(64, 64, 17), 64, 64, 5.0),
    ('noise_q95', raster_noise(64, 64, 19), 64, 64, 95.0),
    ('mixed', raster_mixed(160, 96, 23), 160, 96, 70.0),
    ('tiny', raster_mixed(5, 3, 29), 5, 3, 60.0),
]

# full-config fixtures: (name, raster, w, h, quality, config overrides)
CFG_FIXTURES = [
    ('parts4', raster_noise(128, 80, 31), 128, 80, 60.0, {'partitions': 2}),
    ('parts8', raster_mixed(96, 96, 37), 96, 96, 70.0, {'partitions': 3}),
    ('simplefilter', raster_mixed(80, 80, 41), 80, 80, 55.0,
     {'filter_type': 0, 'filter_strength': 80, 'autofilter': 0}),
    ('sharp7', raster_mixed(96, 64, 43), 96, 64, 65.0,
     {'filter_sharpness': 7, 'filter_strength': 90}),
    ('nofilt', raster_noise(64, 64, 47), 64, 64, 50.0, {'filter_strength': 0}),
    ('method0', raster_mixed(96, 64, 53), 96, 64, 60.0, {'method': 0}),
    ('method6_q100', raster_mixed(96, 64, 59), 96, 64, 100.0, {'method': 6}),
    ('oneseg', raster_mixed(96, 64, 61), 96, 64, 60.0,
     {'segments': 1, 'sns_strength': 0}),
]

os.makedirs(OUT, exist_ok=True)
meta = {}
for name, rgba, w, h, q, overrides in \
        [(n, r, w, h, q, None) for n, r, w, h, q in FIXTURES] + CFG_FIXTURES:
    data = encode(rgba, w, h, q) if overrides is None \
        else encode_cfg(rgba, w, h, q, **overrides)
    W, H, yp, up, vp = decode_yuv(data)
    assert (W, H) == (w, h)
    with open(os.path.join(OUT, name + '.webp'), 'wb') as f:
        f.write(data)
    with open(os.path.join(OUT, name + '.yuv'), 'wb') as f:
        f.write(yp + up + vp)
    W2, H2, yp2, up2, vp2 = decode_yuv_nofilter(data)
    assert (W2, H2) == (w, h)
    with open(os.path.join(OUT, name + '.nofilter.yuv'), 'wb') as f:
        f.write(yp2 + up2 + vp2)
    meta[name] = {'w': w, 'h': h, 'q': q, 'webp_bytes': len(data)}
    print(f'{name}: {w}x{h} q{q} -> {len(data)} bytes webp,'
          f' {len(yp) + len(up) + len(vp)} bytes yuv')

with open(os.path.join(OUT, 'meta.json'), 'w') as f:
    json.dump(meta, f, indent=1, sort_keys=True)
print('wrote', OUT)
