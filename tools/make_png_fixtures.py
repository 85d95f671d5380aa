#!/usr/bin/env python3
"""Generate small deterministic grayscale PNG fixtures (pure stdlib: zlib +
struct — no imaging libs). Dimensions are < 256 so the oracle can read the
width/height LSB straight out of the IHDR header bytes. Dev tool only.
"""
import struct, zlib, os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "blobs")

def chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def png(width: int, height: int, seed: int) -> bytes:
    # deterministic pixel pattern; grayscale 8-bit, no filter per scanline
    raw = b"".join(
        b"\x00" + bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width))
        for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))

def main():
    specs = [("img_doc_101.png", 17, 9, 3), ("img_doc_102.png", 33, 21, 7),
             ("img_doc_103.png", 120, 77, 11)]
    for name, w, h, seed in specs:
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(png(w, h, seed))
        print(f"wrote {path} {w}x{h} ({os.path.getsize(path)} bytes)")

if __name__ == "__main__":
    main()
