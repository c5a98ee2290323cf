#!/usr/bin/env python3
"""Generate VP8 (WebP-lossy) golden fixtures + the RFC 6386 constant
tables for Vp8Decode/Vp8DecodeSpec.

Two outputs:

1. src/main/scala/graft/operators/Vp8Tables.scala — the four large
   constant tables every conformant VP8 codec carries byte-identically
   (RFC 6386 §13.4 default coefficient probabilities and update
   probabilities, §11.4 keyframe B-mode probabilities, §14.1 quantizer
   lookups). They are the SPEC's published constants — too large to
   hand-type without transcription risk, so they are read out of the
   system libwebp decoder's .rodata, located STRUCTURALLY (the AC
   quantizer table's unique monotone 4..284 uint16 signature, then
   table adjacency: bands | update-probs | kf-bmode-probs | defaults)
   and validated by invariants here plus byte-for-byte end-to-end
   decode goldens in Vp8DecodeSpec. Wrong bytes cannot pass: the
   boolean decoder desynchronizes on the first wrong probability.

2. src/test/scala/graft/operators/Vp8Golden.scala — fixtures encoded
   by the SYSTEM libwebp encoder (an implementation independent of
   graft's from-spec decoder) across the keyframe feature space
   (quality sweep, loop filter off/normal/simple/auto, sharpness,
   segments, multi-partition, non-MB-aligned sizes), each with the
   system DECODER's Y/U/V planes as the expected output. VP8 decode
   is exact integer arithmetic — conformant decoders agree
   byte-for-byte, so the comparison is equality, not tolerance.

Build-time tool only — the engine itself never links libwebp.
Run: python3 tools/gen_vp8_golden.py
"""
import ctypes
import hashlib
import struct
import subprocess
import sys
from ctypes import (POINTER, Structure, byref, c_float, c_int, c_size_t,
                    c_uint8, c_uint32, c_void_p)

LIB = "/lib/x86_64-linux-gnu/libwebp.so.7"
lw = ctypes.CDLL(LIB)

# ---- table extraction ------------------------------------------------

BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]  # RFC 6386 §13.3


def rodata():
    out = subprocess.run(["objdump", "-h", LIB], capture_output=True, text=True).stdout
    for line in out.splitlines():
        if ".rodata" in line:
            parts = line.split()
            size, off = int(parts[2], 16), int(parts[5], 16)
            data = open(LIB, "rb").read()
            return data[off:off + size]
    raise RuntimeError("no .rodata")


def extract_tables():
    ro = rodata()
    # anchor: the AC quantizer table — monotone uint16[128] 4..284
    ac_at = None
    for i in range(0, len(ro) - 256, 2):
        arr = struct.unpack_from("<128H", ro, i)
        if arr[:6] == (4, 5, 6, 7, 8, 9) and arr[-1] == 284 and \
           all(arr[j] <= arr[j + 1] for j in range(127)):
            ac_at = i
            break
    assert ac_at is not None, "AC quantizer table not found"
    ac = list(struct.unpack_from("<128H", ro, ac_at))
    dc = list(ro[ac_at + 256: ac_at + 256 + 128])          # uint8[128]
    bands_at = ac_at + 256 + 128
    assert list(ro[bands_at:bands_at + 16]) == BANDS, "band table mismatch"
    upd_at = bands_at + 32                                  # 16B zero pad between
    assert ro[bands_at + 16:upd_at] == b"\x00" * 16
    update = list(ro[upd_at:upd_at + 1056])
    bmode_at = upd_at + 1056
    bmode_stored = list(ro[bmode_at:bmode_at + 900])
    # libwebp stores kBModesProba rows in ITS submode enum order
    # (…, B_RD=4, B_VR=5, B_LD=6, …) while the tree-leaf numbering the
    # decoder uses is (…, B_LD=4, B_RD=5, B_VR=6, …) — found by a
    # structured-edge mode sweep against the system decoder (all 10
    # predictors and 100 context pairs byte-exact after this permute).
    pm = {4: 6, 5: 4, 6: 5}
    bmode = [0] * 900
    for a in range(10):
        for l in range(10):
            src = (pm.get(a, a) * 10 + pm.get(l, l)) * 9
            dst = (a * 10 + l) * 9
            bmode[dst:dst + 9] = bmode_stored[src:src + 9]
    # defaults follow after zero padding: flat [4][8][3][11] — but the
    # table STARTS 33 bytes BEFORE the well-known {253,136,...} row,
    # because the RFC's [0][0] block is three {128,...} dummy rows
    # (plane 0 = luma-after-Y2 starts at coefficient 1, so its band 0
    # is unreachable) and {253,136,...} is [0][1][0]. Verified two
    # ways: the disassembled parse loop indexes base+plane*264+band*33
    # +ctx*11+p from this exact base, and a 512-case crafted-stream
    # sweep against the system decoder agrees on every in-bounds case.
    rest = ro[bmode_at + 900:]
    def_at = rest.index(bytes([253, 136, 254, 255, 228, 219])) - 33
    assert 0 <= def_at < 128, "defaults not adjacent"
    defaults = list(rest[def_at:def_at + 1056])
    assert defaults[:33] == [128] * 33, "[0][0] dummy block missing"
    assert defaults[264:267] == [198, 35, 237], "[1][0][0] anchor"
    assert defaults[792:795] == [202, 24, 213], "[3][0][0] anchor"
    # invariants
    assert dc[0] == 4 and dc[-1] == 157 and all(dc[i] <= dc[i + 1] for i in range(127))
    assert dc[117] == 132  # why libwebp clamps the uv_dc INDEX at 117
    # NOTE a probability byte of 0 is functionally legal in the bool
    # decoder (split = 1 + ((range-1)*0 >> 8) = 1) and the published
    # table contains a few; the real validation is the end-to-end
    # golden decode — one wrong byte desynchronizes the whole stream.
    assert all(1 <= p <= 255 for p in update), "update probs out of range"
    assert all(1 <= p <= 255 for p in bmode), "bmode probs out of range"
    assert sum(1 for p in update if p == 255) > 600
    return dc, ac, update, bmode, defaults


# ---- libwebp encode/decode wrappers ---------------------------------

class WebPPicture(Structure):
    _fields_ = [
        ("use_argb", c_int), ("colorspace", c_int), ("width", c_int), ("height", c_int),
        ("y", POINTER(c_uint8)), ("u", POINTER(c_uint8)), ("v", POINTER(c_uint8)),
        ("y_stride", c_int), ("uv_stride", c_int),
        ("a", POINTER(c_uint8)), ("a_stride", c_int),
        ("pad1", c_uint32 * 2),
        ("argb", POINTER(c_uint32)), ("argb_stride", c_int),
        ("pad2", c_uint32 * 3),
        ("writer", c_void_p), ("custom_ptr", c_void_p),
        ("extra_info_type", c_int), ("extra_info", c_void_p),
        ("stats", c_void_p), ("error_code", c_int),
        ("progress_hook", c_void_p), ("user_data", c_void_p),
        ("pad3", c_uint32 * 3), ("pad4", c_void_p), ("pad5", c_void_p),
        ("pad6", c_uint32 * 8),
        ("memory_", c_void_p), ("memory_argb_", c_void_p), ("pad7", c_void_p * 2)]


class WebPMemoryWriter(Structure):
    _fields_ = [("mem", c_void_p), ("size", c_size_t), ("max_size", c_size_t),
                ("pad", c_uint32)]


ABI = 0x020F
# WebPConfig int-field byte offsets (layout verified against preset
# defaults: quality 75@4, method 4@8, segments 4@24, sns 50@28, ...)
CFG_OFF = {"method": 8, "segments": 24, "sns_strength": 28, "filter_strength": 32,
           "filter_sharpness": 36, "filter_type": 40, "autofilter": 44,
           "pass": 60, "partitions": 72, "qmin": 108, "qmax": 112}

lw.WebPConfigInitInternal.restype = c_int
lw.WebPValidateConfig.restype = c_int
lw.WebPPictureInitInternal.restype = c_int
lw.WebPPictureImportRGB.restype = c_int
lw.WebPEncode.restype = c_int
lw.WebPDecodeYUV.restype = POINTER(c_uint8)
lw.WebPFree.argtypes = [c_void_p]


def encode(rgb: bytes, w: int, h: int, quality: float, **cfg_fields) -> bytes:
    cfg = (ctypes.c_byte * 512)()
    assert lw.WebPConfigInitInternal(byref(cfg), 0, c_float(quality), ABI)
    for name, val in cfg_fields.items():
        struct.pack_into("<i", cfg, CFG_OFF[name], val)
    assert lw.WebPValidateConfig(byref(cfg)), f"bad config {cfg_fields}"
    pic = WebPPicture()
    assert lw.WebPPictureInitInternal(byref(pic), ABI)
    pic.width, pic.height = w, h
    assert lw.WebPPictureImportRGB(byref(pic), rgb, w * 3)
    mw = WebPMemoryWriter()
    lw.WebPMemoryWriterInit(byref(mw))
    pic.writer = ctypes.cast(lw.WebPMemoryWrite, c_void_p)
    pic.custom_ptr = ctypes.cast(byref(mw), c_void_p)
    ok = lw.WebPEncode(byref(cfg), byref(pic))
    assert ok, f"encode failed err={pic.error_code}"
    out = ctypes.string_at(mw.mem, mw.size)
    lw.WebPFree(mw.mem)
    lw.WebPPictureFree(byref(pic))
    assert out[12:16] == b"VP8 ", "expected a lossy VP8 chunk"
    return out


def decode_yuv(webp: bytes):
    wv, hv = c_int(), c_int()
    up, vp = POINTER(c_uint8)(), POINTER(c_uint8)()
    ys, uvs = c_int(), c_int()
    p = lw.WebPDecodeYUV(webp, len(webp), byref(wv), byref(hv),
                         byref(up), byref(vp), byref(ys), byref(uvs))
    assert p, "system decode failed"
    w, h = wv.value, hv.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = b"".join(bytes(p[r * ys.value + c] for c in range(w)) for r in range(h))
    u = b"".join(bytes(up[r * uvs.value + c] for c in range(cw)) for r in range(ch))
    v = b"".join(bytes(vp[r * uvs.value + c] for c in range(cw)) for r in range(ch))
    lw.WebPFree(p)
    return w, h, y, u, v


# ---- deterministic integer image generators (mirrored in the spec) --

def lcg_bytes(seed: int, n: int) -> bytes:
    s = seed & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((s >> 33) & 0xFF)
    return bytes(out)


def gen_rgb(kind: str, w: int, h: int, p: int) -> bytes:
    px = bytearray()
    if kind == "gradient":
        for y in range(h):
            for x in range(w):
                px += bytes(((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
                             ((x + y) * 255) // max(w + h - 2, 1)))
    elif kind == "smooth":
        for y in range(h):
            for x in range(w):
                px += bytes((((x >> 2) * 8) & 0xFF, ((y >> 2) * 8) & 0xFF,
                             (((x + y) >> 3) * 8) & 0xFF))
    elif kind == "tiles":
        for y in range(h):
            for x in range(w):
                tx, ty = x % p, y % p
                px += bytes(((tx * 37) & 0xFF, (ty * 53) & 0xFF, ((tx + ty) * 11) & 0xFF))
    elif kind == "noise":
        px += lcg_bytes(p, w * h * 3)
    elif kind == "checker":
        for y in range(h):
            for x in range(w):
                px += bytes((200, 40, 40) if ((x // p) + (y // p)) % 2 == 0 else (40, 40, 200))
    elif kind == "edges":  # hard horizontal/vertical/diagonal edges — loop-filter food
        for y in range(h):
            for x in range(w):
                v = 230 if (x * 3 < w) else (20 if (y * 3 < h) else (200 if x > y else 60))
                px += bytes((v, 255 - v, (v * 3) & 0xFF))
    else:
        raise ValueError(kind)
    assert len(px) == w * h * 3
    return bytes(px)


# name, kind, w, h, param, quality, config-overrides
FIXTURES = [
    # stage A: loop filter OFF — isolates prediction + transform path
    ("nf_flat1x1",    "gradient",  1,  1, 0, 75, dict(filter_strength=0, segments=1)),
    ("nf_grad16",     "gradient", 16, 16, 0, 75, dict(filter_strength=0, segments=1)),
    ("nf_grad_odd",   "gradient", 33, 17, 0, 75, dict(filter_strength=0, segments=1)),
    ("nf_smooth48",   "smooth",   48, 32, 0, 75, dict(filter_strength=0, segments=1)),
    ("nf_tiles",      "tiles",    48, 48, 8, 75, dict(filter_strength=0, segments=1)),
    ("nf_noise32",    "noise",    32, 32, 7, 75, dict(filter_strength=0, segments=1)),
    ("nf_noise_q95",  "noise",    32, 32, 9, 95, dict(filter_strength=0, segments=1)),
    ("nf_checker_q10", "checker", 32, 32, 4, 10, dict(filter_strength=0, segments=1)),
    ("nf_edges",      "edges",    64, 48, 0, 50, dict(filter_strength=0, segments=1)),
    ("nf_segments4",  "edges",    64, 64, 0, 75, dict(filter_strength=0, segments=4)),
    ("nf_parts4",     "noise",    64, 48, 3, 75, dict(filter_strength=0, segments=1, partitions=2)),
    # stage B: normal loop filter
    ("lf_grad16",     "gradient", 16, 16, 0, 75, dict(segments=1)),
    ("lf_edges",      "edges",    64, 48, 0, 50, dict(segments=1)),
    ("lf_edges_q10",  "edges",    48, 48, 0, 10, dict(segments=1)),
    ("lf_sharp4",     "edges",    48, 32, 0, 40, dict(segments=1, filter_sharpness=4)),
    ("lf_sharp7",     "checker",  32, 32, 8, 30, dict(segments=1, filter_sharpness=7)),
    ("lf_defaults",   "edges",    80, 64, 0, 75, dict()),  # segments=4, strength 60
    ("lf_autofilter", "smooth",   64, 64, 0, 60, dict(autofilter=1)),
    ("lf_strong100",  "checker",  48, 48, 6, 20, dict(segments=1, filter_strength=100)),
    # simple filter (filter_type=0 + low strength keeps level in simple range)
    ("sf_edges",      "edges",    48, 48, 0, 50, dict(segments=1, filter_type=0)),
    ("sf_checker",    "checker",  32, 32, 4, 35, dict(segments=1, filter_type=0)),
    # bigger composite
    ("big_mix",       "edges",   128, 80, 0, 65, dict()),
    ("big_parts8",    "noise",   128, 64, 11, 55, dict(partitions=3)),
]


def hexlit(b: bytes, indent: str) -> str:
    hx = b.hex().upper()
    parts = [f'"{hx[i:i + 110]}"' for i in range(0, len(hx), 110)]
    return (" +\n" + indent).join(parts)


def write_tables(dc, ac, update, bmode, defaults):
    def hexstr(vals, width):
        return "".join(f"%0{width}X" % v for v in vals)
    with open("src/main/scala/graft/operators/Vp8Tables.scala", "w") as f:
        f.write('''package graft.operators

/** GENERATED by tools/gen_vp8_golden.py — do not edit.
  *
  * The RFC 6386 constant tables every conformant VP8 codec carries
  * byte-identically: §14.1 quantizer lookups (dc/ac), §13.4 default
  * coefficient probabilities + update probabilities, §11.4 keyframe
  * subblock-mode probabilities. Published spec constants, not code:
  * they are read out of the system libwebp decoder (located
  * structurally, validated by invariants) because hand-typing ~3k
  * digits invites transcription errors the golden suite would then
  * chase. Any wrong byte fails Vp8DecodeSpec: the boolean decoder
  * desynchronizes on the first wrong probability.
  */
object Vp8Tables {
  private def u8s(hx: String): Array[Int] =
    hx.grouped(2).map(Integer.parseInt(_, 16)).toArray
  private def u16s(hx: String): Array[Int] =
    hx.grouped(4).map(Integer.parseInt(_, 16)).toArray

  /** dc_qlookup[128] (§14.1) */
  val dcQ: Array[Int] = u8s(
    "''' + hexstr(dc, 2) + '''")

  /** ac_qlookup[128] (§14.1) */
  val acQ: Array[Int] = u16s(
    "''' + hexstr(ac, 4) + '''")

  private val updateHex =
''')
        uh = hexstr(update, 2)
        for i in range(0, len(uh), 112):
            sep = " +" if i + 112 < len(uh) else ""
            f.write(f'    "{uh[i:i+112]}"{sep}\n')
        f.write('''
  /** coeff_update_probs[4][8][3][11] flattened (§13.4) */
  val updateProbs: Array[Int] = u8s(updateHex)

  private val defaultHex =
''')
        dh = hexstr(defaults, 2)
        for i in range(0, len(dh), 112):
            sep = " +" if i + 112 < len(dh) else ""
            f.write(f'    "{dh[i:i+112]}"{sep}\n')
        f.write('''
  /** default_coeff_probs[4][8][3][11] flattened (§13.4) */
  val defaultCoeffProbs: Array[Int] = u8s(defaultHex)

  private val bmodeHex =
''')
        bh = hexstr(bmode, 2)
        for i in range(0, len(bh), 112):
            sep = " +" if i + 112 < len(bh) else ""
            f.write(f'    "{bh[i:i+112]}"{sep}\n')
        f.write('''
  /** kf_bmode_prob[10][10][9] flattened (§11.4) */
  val kfBModeProbs: Array[Int] = u8s(bmodeHex)
}
''')


def main():
    dc, ac, update, bmode, defaults = extract_tables()
    print("tables: dc[0..3]=%s ac[-2:]=%s upd255=%d" %
          (dc[:4], ac[-2:], sum(1 for p in update if p == 255)))
    write_tables(dc, ac, update, bmode, defaults)
    print("wrote Vp8Tables.scala")

    entries = []
    for name, kind, w, h, p, q, cfg in FIXTURES:
        rgb = gen_rgb(kind, w, h, p)
        webp = encode(rgb, w, h, float(q), **cfg)
        dw, dh_, y, u, v = decode_yuv(webp)
        assert (dw, dh_) == (w, h)
        entries.append((name, kind, w, h, p, q, webp, y, u, v))
        print(f"{name}: {w}x{h} q={q} webp={len(webp)}B cfg={cfg}")

    with open("src/test/scala/graft/operators/Vp8Golden.scala", "w") as f:
        f.write('''package graft.operators

/** GENERATED by tools/gen_vp8_golden.py — do not edit.
  *
  * Golden WebP-lossy (VP8 keyframe) fixtures: encoded by the SYSTEM
  * libwebp encoder across the keyframe feature space; `yHex`/`uHex`/
  * `vHex` are the SYSTEM DECODER's output planes. VP8 reconstruction
  * is exact integer arithmetic, so Vp8DecodeSpec compares
  * byte-for-byte.
  */
object Vp8Golden {
  final case class G(name: String, w: Int, h: Int,
                     webpHex: String, yHex: String, uHex: String, vHex: String)

  val all: Seq[G] = Seq(
''')
        for name, kind, w, h, p, q, webp, y, u, v in entries:
            f.write(f'    G("{name}", {w}, {h},\n')
            f.write(f'      {hexlit(webp, "      ")},\n')
            f.write(f'      {hexlit(y, "      ")},\n')
            f.write(f'      {hexlit(u, "      ")},\n')
            f.write(f'      {hexlit(v, "      ")}),\n')
        f.write("  )\n}\n")
    total = sum(len(e[6]) + len(e[7]) + len(e[8]) + len(e[9]) for e in entries)
    print(f"wrote {len(entries)} fixtures, {total} bytes total")
    # generator parity digest (ties the Scala table file to this script's extraction)
    digest = hashlib.sha256(bytes(dc) + struct.pack("<128H", *ac) +
                            bytes(update) + bytes(bmode) + bytes(defaults)).hexdigest()
    print("table digest:", digest)


if __name__ == "__main__":
    sys.exit(main())
