"""Deterministic generator for the REAL-header media fixtures
(`tests/fixtures/media/imgreal_*`) used by the round-13
`multimodal_decode_real` / `multimodal_resize_real` /
`multimodal_features_real` differentials.

Everything is a pure function of the file name (md5-seeded byte
streams), so re-running reproduces the committed bytes exactly:

- PNGs: fully valid files (IHDR + zlib IDAT + IEND, correct CRCs) with
  REAL pixel data pixel(x,y) = ((7x+13y)%256, (3x+5y)%256, (11x+2y)%256)
  (gray uses the first component), written with scanline filters 0/1/2
  across the three files to exercise the unfilter paths.
- JPEGs: valid marker structure (APP0 JFIF, DQT filler, SOF0 with real
  dims, SOS, deterministic entropy bytes, EOI). Pixels are NOT real
  (stdlib can't inflate DCT) — only header dims are contract.
- GIF89a: header + logical screen dims + trailer.
- WAV: canonical PCM layout (RIFF size, 16-byte fmt chunk with real
  tag/channels/rate/align/bits, data chunk of seeded noise) — the
  fmt fields are REAL metadata the wav-header differential parses.
- blob: seeded noise, no magic (NULL-format path).

Run: python tests/fixtures/media_gen.py  (writes files, prints truth
rows; the committed fixtures were produced by exactly this script)."""
from __future__ import annotations

import hashlib
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).parent / "media"

PNG_SPECS = [  # (name, w, h, color_type, scanline_filter)
    ("imgreal_a.png", 37, 23, 2, 0),
    ("imgreal_b.png", 64, 48, 0, 1),
    ("imgreal_c.png", 17, 31, 6, 2),
]
JPEG_SPECS = [("imgreal_d.jpg", 320, 200), ("imgreal_e.jpg", 41, 59)]
# padded variant: spec-legal 0xFF fill bytes precede the DQT and SOF0
# markers (ITU T.81 §B.1.1.2 allows any number of FF fill bytes before
# a marker) — exercises the fill-byte skip in parse_media_header and
# the oracle's recursive marker walk (round-13 advice item).
JPEG_PADDED_SPECS = [("imgreal_i.jpg", 77, 55)]
GIF_SPECS = [("imgreal_f.gif", 101, 67)]


def _noise(name: str, n: int) -> bytes:
    out, block, i = b"", b"", 0
    while len(out) < n:
        block = hashlib.md5(f"{name}:{i}".encode()).digest()
        out += block
        i += 1
    return out[:n]


def _png_pixels(w: int, h: int, color: int) -> bytes:
    """Raw scanlines, channel-interleaved, no filter bytes."""
    ch = {0: 1, 2: 3, 6: 4}[color]
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            px = [(7 * x + 13 * y) % 256, (3 * x + 5 * y) % 256, (11 * x + 2 * y) % 256, 255]
            row.extend(px[:ch] if ch != 1 else px[:1])
        rows.append(bytes(row))
    return b"".join(rows)


def _filter_scanlines(raw: bytes, w: int, h: int, ch: int, ft: int) -> bytes:
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        out.append(ft)
        if ft == 0:
            out.extend(line)
        elif ft == 1:  # Sub
            out.extend(
                (line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF for x in range(stride)
            )
        elif ft == 2:  # Up
            out.extend((line[x] - prev[x]) & 0xFF for x in range(stride))
        else:
            raise ValueError(ft)
        prev = line
    return bytes(out)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + tag + body + struct.pack(
        ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
    )


def write_png(name: str, w: int, h: int, color: int, ft: int) -> bytes:
    ch = {0: 1, 2: 3, 6: 4}[color]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _png_pixels(w, h, color)
    idat = zlib.compress(_filter_scanlines(raw, w, h, ch, ft), 6)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    (OUT / name).write_bytes(data)
    return data


def write_jpeg(name: str, w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + _noise(name + ":dqt", 64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    entropy = _noise(name + ":entropy", 257).replace(b"\xff", b"\xfe")
    data = b"\xff\xd8" + app0 + dqt + sof0 + sos + entropy + b"\xff\xd9"
    (OUT / name).write_bytes(data)
    return data


def write_jpeg_padded(name: str, w: int, h: int) -> bytes:
    """Same marker structure as write_jpeg but with runs of 0xFF fill
    bytes before the DQT and SOF0 markers (so the stream reads
    ... FF FF FF DB ... and ... FF FF FF FF C0 ...)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xff" + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + _noise(name + ":dqt", 64)
    sof0 = (
        b"\xff\xff\xff"
        + b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    entropy = _noise(name + ":entropy", 199).replace(b"\xff", b"\xfe")
    data = b"\xff\xd8" + app0 + dqt + sof0 + sos + entropy + b"\xff\xd9"
    (OUT / name).write_bytes(data)
    return data


def write_gif(name: str, w: int, h: int) -> bytes:
    data = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"
    (OUT / name).write_bytes(data)
    return data


def write_misc() -> dict[str, bytes]:
    # canonical PCM WAV: RIFF size, fmt chunk (16-byte PCM: tag 1,
    # 2 ch, 22050 Hz, block align 4, 16 bit), data chunk of seeded noise
    data = _noise("imgreal_g.wav:data", 400)
    fmt = struct.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    (OUT / "imgreal_g.wav").write_bytes(wav)
    blob = _noise("imgreal_h.blob", 222)
    assert blob[:2] != b"\xff\xd8" and blob[:4] != b"RIFF"
    (OUT / "imgreal_h.blob").write_bytes(blob)
    return {"imgreal_g.wav": wav, "imgreal_h.blob": blob}


def main() -> None:
    rows = []
    for name, w, h, color, ft in PNG_SPECS:
        d = write_png(name, w, h, color, ft)
        rows.append((name, "png", w, h, len(d), hashlib.md5(d).hexdigest()))
    for name, w, h in JPEG_SPECS:
        d = write_jpeg(name, w, h)
        rows.append((name, "jpeg", w, h, len(d), hashlib.md5(d).hexdigest()))
    for name, w, h in JPEG_PADDED_SPECS:
        d = write_jpeg_padded(name, w, h)
        rows.append((name, "jpeg", w, h, len(d), hashlib.md5(d).hexdigest()))
    for name, w, h in GIF_SPECS:
        d = write_gif(name, w, h)
        rows.append((name, "gif", w, h, len(d), hashlib.md5(d).hexdigest()))
    for name, d in write_misc().items():
        fmt = "wav" if name.endswith(".wav") else None
        rows.append((name, fmt, None, None, len(d), hashlib.md5(d).hexdigest()))
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
