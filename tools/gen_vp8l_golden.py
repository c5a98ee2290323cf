#!/usr/bin/env python3
"""Generate VP8L (WebP-lossless) golden fixtures for Vp8lDecodeSpec.

Encodes deterministic integer-formula images with the SYSTEM libwebp
encoder (an implementation independent of graft's from-spec decoder)
and emits src/test/scala/graft/operators/Vp8lGolden.scala holding, per
fixture: the generator name+params (the Scala spec re-derives the RGBA
with the same integer formulas), a SHA-256 of the RGBA (generator
parity proof), and the webp bytes as hex.

Build-time tool only — the engine itself never links libwebp.
Run: python3 tools/gen_vp8l_golden.py
"""
import ctypes, hashlib, sys

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lw.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lw.WebPFree.argtypes = [ctypes.c_void_p]


def encode(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("encode failed")
    data = bytes(out[i] for i in range(n))
    lw.WebPFree(out)
    return data


def decode(webp: bytes):
    wv, hv = ctypes.c_int(), ctypes.c_int()
    p = lw.WebPDecodeRGBA(webp, len(webp), ctypes.byref(wv), ctypes.byref(hv))
    if not p:
        return None
    data = bytes(p[i] for i in range(wv.value * hv.value * 4))
    lw.WebPFree(p)
    return wv.value, hv.value, data


# ---- integer-only generators (mirrored in Vp8lDecodeSpec) -----------

def lcg_bytes(seed: int, n: int) -> bytes:
    s = seed & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((s >> 33) & 0xFF)
    return bytes(out)


def gen(kind: str, w: int, h: int, p: int) -> bytes:
    px = bytearray()
    if kind == "noise":          # full-random RGBA, alpha forced opaque
        raw = lcg_bytes(p, w * h * 4)
        for i in range(w * h):
            px += raw[4 * i:4 * i + 3] + b"\xff"
    elif kind == "noisealpha":   # random including alpha (never 0 —
        # the reference encoder rewrites RGB under transparent pixels)
        raw = lcg_bytes(p, w * h * 4)
        for i in range(w * h):
            px += raw[4 * i:4 * i + 3] + bytes((raw[4 * i + 3] | 1,))
    elif kind == "gradient":
        for y in range(h):
            for x in range(w):
                r = (x * 255) // max(w - 1, 1)
                g = (y * 255) // max(h - 1, 1)
                b = ((x + y) * 255) // max(w + h - 2, 1)
                px += bytes((r, g, b, 255))
    elif kind == "palette":      # p colors from an LCG table
        tbl = [tuple(lcg_bytes(1000 + i, 3)) + (255,) for i in range(p)]
        for y in range(h):
            for x in range(w):
                px += bytes(tbl[(x * 7 + y * 13 + ((x * y) & 3)) % p])
    elif kind == "checker":      # 2-color checkerboard, cell size p
        for y in range(h):
            for x in range(w):
                c = (200, 40, 40, 255) if ((x // p) + (y // p)) % 2 == 0 else (40, 40, 200, 255)
                px += bytes(c)
    elif kind == "tiles":        # p×p tile repeated — LZ77-friendly
        for y in range(h):
            for x in range(w):
                tx, ty = x % p, y % p
                px += bytes(((tx * 37) & 0xFF, (ty * 53) & 0xFF, ((tx + ty) * 11) & 0xFF, 255))
    elif kind == "smooth":       # blocky smooth ramps — predictor-friendly
        for y in range(h):
            for x in range(w):
                px += bytes((((x >> 2) * 8) & 0xFF, ((y >> 2) * 8) & 0xFF,
                             (((x + y) >> 3) * 8) & 0xFF, 255))
    elif kind == "alphagrad":
        for y in range(h):
            for x in range(w):
                px += bytes((255 - (x * 255) // max(w - 1, 1), 128,
                             (y * 255) // max(h - 1, 1),
                             1 + (x * 254) // max(w - 1, 1)))
    else:
        raise ValueError(kind)
    assert len(px) == w * h * 4
    return bytes(px)


FIXTURES = [
    ("one_px",        "gradient",   1,   1,  0),
    ("row",           "gradient",  17,   1,  0),
    ("col",           "gradient",   1,  23,  0),
    ("four_color",    "palette",    2,   2,  4),
    ("checker2",      "checker",   16,  16,  2),
    ("palette3",      "palette",   20,  12,  3),
    ("palette12",     "palette",   33,  21, 12),
    ("palette17",     "palette",   40,  25, 17),
    ("palette200",    "palette",   64,  48, 200),
    ("tiles8",        "tiles",     40,  40,  8),
    ("gradient64",    "gradient",  64,  64,  0),
    ("smooth",        "smooth",    96,  80,  0),
    ("noise48",       "noise",     48,  48,  7),
    ("noise_alpha",   "noisealpha", 32,  32, 99),
    ("alphagrad",     "alphagrad", 50,  30,  0),
    ("big_smooth",    "smooth",   300, 200,  0),
    ("big_tiles",     "tiles",    256, 128, 16),
    ("odd_size",      "gradient",  63,  37,  0),
]


def main():
    entries = []
    for name, kind, w, h, p in FIXTURES:
        rgba = gen(kind, w, h, p)
        webp = encode(rgba, w, h)
        dec = decode(webp)
        assert dec is not None and dec[0] == w and dec[1] == h and dec[2] == rgba, \
            f"libwebp round-trip failed for {name}"
        sha = hashlib.sha256(rgba).hexdigest()
        entries.append((name, kind, w, h, p, sha, webp))
        print(f"{name}: {w}x{h} kind={kind} p={p} webp={len(webp)}B")

    def hexlit(b: bytes) -> str:
        hx = b.hex().upper()
        # split into 120-char chunks concatenated with +
        parts = [f'"{hx[i:i + 120]}"' for i in range(0, len(hx), 120)]
        return " +\n      ".join(parts)

    with open("src/test/scala/graft/operators/Vp8lGolden.scala", "w") as f:
        f.write(
"""package graft.operators

/** GENERATED by tools/gen_vp8l_golden.py — do not edit.
  *
  * Golden WebP-lossless fixtures encoded by the SYSTEM libwebp
  * encoder (independent of graft's from-spec decoder). `rgbaSha256`
  * is the digest of the generator's RGBA output — Vp8lDecodeSpec
  * re-derives the pixels from the same integer formulas and proves
  * parity before comparing the decode.
  */
object Vp8lGolden {
  final case class G(name: String, kind: String, w: Int, h: Int,
                     param: Int, rgbaSha256: String, webpHex: String)

  val all: Seq[G] = Seq(
""")
        for name, kind, w, h, p, sha, webp in entries:
            f.write(f'    G("{name}", "{kind}", {w}, {h}, {p},\n')
            f.write(f'      "{sha}",\n')
            f.write(f'      {hexlit(webp)}),\n')
        f.write("  )\n}\n")
    total = sum(len(e[6]) for e in entries)
    print(f"wrote {len(entries)} fixtures, {total} webp bytes total")


if __name__ == "__main__":
    sys.exit(main())
