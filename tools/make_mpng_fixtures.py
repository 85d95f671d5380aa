#!/usr/bin/env python3
"""Generate deterministic concatenated-PNG "container" fixtures (.mpng):
N complete PNG streams back to back, one per frame — the minimal motion
container whose frame boundaries are real format structure (each frame is
signature + chunks through IEND), not fixed-size blocks. Pure stdlib
(zlib + struct). Dimensions stay < 256 so the oracle can read width and
height LSBs straight out of each frame's IHDR bytes. Dev tool only.
"""
import struct, zlib, os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "blobs")

def chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def png(width: int, height: int, seed: int) -> bytes:
    # same deterministic grayscale pattern as make_png_fixtures.py
    raw = b"".join(
        b"\x00" + bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width))
        for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))

def main():
    # (name, [(w, h, seed) per frame]) — dims vary WITHIN a container so a
    # fixed-block "demuxer" could never fake the per-frame answers
    specs = [
        ("clip_doc_301.mpng", [(19, 11, 5), (23, 13, 6), (29, 17, 7)]),
        ("clip_doc_302.mpng", [(31, 9, 8), (31, 9, 9), (37, 19, 10),
                               (41, 23, 11), (43, 29, 12)]),
        ("clip_doc_303.mpng", [(53, 31, 13), (59, 37, 14)]),
    ]
    for name, frames in specs:
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            for w, h, seed in frames:
                f.write(png(w, h, seed))
        print(f"wrote {path} ({len(frames)} frames, {os.path.getsize(path)} bytes)")

if __name__ == "__main__":
    main()
