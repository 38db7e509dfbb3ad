"""QOI ("Quite OK Image", qoiformat.org spec, public domain) codec,
stdlib only — a REAL run/index/diff/luma encoder and decoder, no
image library.

The encoder emits a spec-conformant QOI stream: 14-byte header
(magic, big-endian dims, channels, colorspace), then the greedy op
stream — QOI_OP_RUN for repeats (runs cap at 62), QOI_OP_INDEX when
the pixel matches its slot in the 64-entry rolling hash table
(hash = (3r + 5g + 7b + 11a) mod 64), QOI_OP_DIFF for per-channel
deltas in [-2, 1], QOI_OP_LUMA for green-anchored deltas
(dg in [-32, 31], dr-dg / db-dg in [-8, 7]), else a literal
QOI_OP_RGB — closed by the 7x00+01 end marker. The decoder replays
the same state machine, including the rolling index table it must
keep bit-identical to the encoder's.

QOI is LOSSLESS, so decode(encode(x)) == x for any byte string —
``text_to_qoi`` maps each document byte to one grayscale RGB pixel,
and a SQL oracle states the decoded dimensions and channel sum
directly from the text bytes. The roundtrip equality is real
evidence: one wrong hash-table slot or run length desynchronizes the
index table and scrambles every later INDEX op.

Reference repo has no multimodal surface at all; this extends the
compressed-image family (PNG via zlib, GIF87a via LZW, baseline JPEG
via Huffman+IDCT) per SURVEY §2 extensions.
"""

from __future__ import annotations

import struct

QOI_WIDTH_DEFAULT = 64

_MAGIC = b"qoif"
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int = 255) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: bytes, width: int, height: int) -> bytes:
    """Encode an RGB byte string (3 bytes per pixel, row-major) as a
    3-channel QOI stream."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, "
                         f"got {len(pixels)}")
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", width, height, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for i in range(0, len(pixels), 3):
        px = (pixels[i], pixels[i + 1], pixels[i + 2], 255)
        if px == prev:
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        h = _hash(*px)
        if index[h] == px:
            out.append(_OP_INDEX | h)
        else:
            index[h] = px
            dr = px[0] - prev[0]
            dg = px[1] - prev[1]
            db = px[2] - prev[2]
            dr_dg = dr - dg
            db_dg = db - dg
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr_dg + 8) << 4) | (db_dg + 8))
            else:
                out.append(_OP_RGB)
                out += bytes(px[:3])
        prev = px
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 3-channel QOI stream -> (width, height, rgb_bytes)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    width, height, channels, _cs = struct.unpack(">IIBB", data[4:14])
    if channels != 3:
        raise ValueError(f"only 3-channel supported, got {channels}")
    n_px = width * height
    out = bytearray()
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos = 14
    while len(out) < n_px * 3:
        b1 = data[pos]
        pos += 1
        if b1 == _OP_RGB:
            px = (data[pos], data[pos + 1], data[pos + 2], 255)
            pos += 3
            index[_hash(*px)] = px
        elif b1 == _OP_RGBA:
            px = (data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
            pos += 4
            index[_hash(*px)] = px
        else:
            tag = b1 & 0xC0
            if tag == _OP_INDEX:
                px = index[b1 & 0x3F]
            elif tag == _OP_DIFF:
                px = ((px[0] + ((b1 >> 4) & 3) - 2) & 0xFF,
                      (px[1] + ((b1 >> 2) & 3) - 2) & 0xFF,
                      (px[2] + (b1 & 3) - 2) & 0xFF, px[3])
                index[_hash(*px)] = px
            elif tag == _OP_LUMA:
                b2 = data[pos]
                pos += 1
                dg = (b1 & 0x3F) - 32
                dr = dg + ((b2 >> 4) & 0x0F) - 8
                db = dg + (b2 & 0x0F) - 8
                px = ((px[0] + dr) & 0xFF, (px[1] + dg) & 0xFF,
                      (px[2] + db) & 0xFF, px[3])
                index[_hash(*px)] = px
            else:  # _OP_RUN
                run = (b1 & 0x3F) + 1
                out += bytes(px[:3]) * min(run, n_px - len(out) // 3)
                continue
        out += bytes(px[:3])
    if data[pos:pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    return width, height, bytes(out)


def text_to_qoi(raw: bytes, width: int = QOI_WIDTH_DEFAULT) -> bytes:
    """Pack document bytes as grayscale RGB pixels (r=g=b=byte),
    row-major at ``width`` pixels per row, zero-padded to a full
    rectangle (min 1 row), then QOI-encode."""
    height = max(1, -(-len(raw) // width))
    padded = raw + b"\x00" * (width * height - len(raw))
    rgb = bytes(b for byte in padded for b in (byte, byte, byte))
    return encode_qoi(rgb, width, height)


def decode_qoi_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode and project back to one gray byte per pixel (the codec
    wrote r=g=b; assert that held)."""
    w, h, rgb = decode_qoi(data)
    gray = bytearray()
    for i in range(0, len(rgb), 3):
        if not (rgb[i] == rgb[i + 1] == rgb[i + 2]):
            raise ValueError(f"non-gray pixel at {i // 3}")
        gray.append(rgb[i])
    return w, h, bytes(gray)
