"""Pure-Python image codec for the multimodal operators: binary PPM
(P6) encode/decode plus BMP header decode and nearest-neighbor resize.

The container has no PIL/libjpeg, but that only rules out *compressed*
formats — PPM and BMP are trivial enough to implement directly, which
turns the multimodal decode path from a stub into a real end-to-end
pipeline (encode -> decode -> resize -> re-encode), with every step
verifiable byte-for-byte. At scale these functions run inside Arrow
``mapInPandas`` batches (operators/multimodal.py); they are pure
byte-level transforms with no I/O and no driver involvement.

Format notes:
  PPM P6 (netpbm): header ``P6\\n<w> <h>\\n<maxval>\\n`` then w*h*3
    RGB bytes. Whitespace/comment handling per the netpbm spec
    (any whitespace separates tokens; ``#`` starts a comment).
  BMP: 14-byte file header ('BM', little-endian sizes) + BITMAPINFO
    header; width/height/bpp at fixed offsets 18/22/28.
"""

from __future__ import annotations


def encode_ppm(rgb: bytes, width: int, height: int) -> bytes:
    """Binary P6 PPM from raw interleaved RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3 = {width * height * 3}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    honoring '#' comments; returns (tokens, offset-after-last-token's
    single whitespace) per the netpbm spec."""
    toks: list[int] = []
    i = 2  # past 'P6'
    while len(toks) < n:
        # skip whitespace and comments
        while i < len(payload):
            c = payload[i:i + 1]
            if c == b"#":
                while i < len(payload) and payload[i:i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                break
        j = i
        while j < len(payload) and payload[j:j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"malformed PPM header at byte {i}")
        toks.append(int(payload[i:j]))
        i = j
    # exactly ONE whitespace byte separates the header from pixel data
    if i >= len(payload) or not payload[i:i + 1].isspace():
        raise ValueError("PPM header not terminated by whitespace")
    return toks, i + 1


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb bytes) from a binary P6 PPM."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (width, height, maxval), off = _ppm_tokens(payload, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = width * height * 3
    rgb = payload[off:off + need]
    if len(rgb) != need:
        raise ValueError(f"truncated PPM: {len(rgb)} of {need} pixel bytes")
    return width, height, rgb


def decode_bmp_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, bits-per-pixel) from a BMP file header. Height
    is returned as magnitude (negative height = top-down rows)."""
    if payload[:2] != b"BM" or len(payload) < 30:
        raise ValueError("not a BMP")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    return width, abs(height), bpp


def sniff(payload: bytes) -> str | None:
    """'ppm' | 'bmp' | None."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def decode_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) of any supported format."""
    kind = sniff(payload)
    if kind == "ppm":
        w, h, _ = decode_ppm(payload)
        return w, h
    if kind == "bmp":
        w, h, _ = decode_bmp_header(payload)
        return w, h
    raise ValueError("unsupported image format")


def resize_nn_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a P6 PPM — a REAL resize, not a
    decimation stub: output pixel (x, y) samples input pixel
    (floor(x*w/out_w), floor(y*h/out_h))."""
    w, h, rgb = decode_ppm(payload)
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = y * h // out_h
        row = sy * w * 3
        orow = y * out_w * 3
        for x in range(out_w):
            sx = x * w // out_w
            s = row + sx * 3
            o = orow + x * 3
            out[o:o + 3] = rgb[s:s + 3]
    return encode_ppm(bytes(out), out_w, out_h)


def text_to_ppm(text_bytes: bytes, width: int = 32) -> bytes:
    """Deterministic test-image synthesis: pack a byte payload into a
    ``width``-wide RGB raster (zero-padded to full rows) and wrap it in
    a real P6 header. ceil(len/ (3*width)) rows; mirrored exactly by
    the SQL oracle for driver verification."""
    row_bytes = width * 3
    height = max(1, -(-len(text_bytes) // row_bytes))
    padded = text_bytes.ljust(width * height * 3, b"\x00")
    return encode_ppm(padded, width, height)
