#!/usr/bin/env python3
"""Generate small deterministic grayscale PNG fixtures (pure stdlib: zlib +
struct — no imaging libs). Dimensions are < 256 so the oracle can read the
width/height LSB straight out of the IHDR header bytes. Dev tool only.

Pixel formula (the phash oracle recomputes dHash from THIS closed form,
so it must stay in sync with the x_image_phash_neardup oracle SQL):
    v(x, y) = (x*kx + y*ky + seed + (delta if x < px and y < py else 0)) % 256
Images 101-103 are the original three (kx=31, ky=17, no perturbation —
regenerating must keep them byte-identical). 104/106 are near-duplicates
of 103/105 (same gradient, one perturbed block — dHash hamming 4); 105
and 107 are unrelated gradients (pairwise hamming >= 19 to everything).
"""
import struct, zlib, os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "blobs")

def chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def png(width: int, height: int, kx: int, ky: int, seed: int,
        px: int = 0, py: int = 0, delta: int = 0) -> bytes:
    # deterministic pixel pattern; grayscale 8-bit, no filter per scanline
    raw = b"".join(
        b"\x00" + bytes(
            (x * kx + y * ky + seed + (delta if x < px and y < py else 0)) % 256
            for x in range(width))
        for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))

def main():
    specs = [
        ("img_doc_101.png", 17, 9, 31, 17, 3, 0, 0, 0),
        ("img_doc_102.png", 33, 21, 31, 17, 7, 0, 0, 0),
        ("img_doc_103.png", 120, 77, 31, 17, 11, 0, 0, 0),
        ("img_doc_104.png", 120, 77, 31, 17, 11, 27, 30, 100),  # ~103
        ("img_doc_105.png", 90, 60, 73, 41, 5, 0, 0, 0),
        ("img_doc_106.png", 90, 60, 73, 41, 5, 30, 23, 100),    # ~105
        ("img_doc_107.png", 64, 48, 7, 113, 29, 0, 0, 0),
    ]
    for name, w, h, kx, ky, seed, px, py, delta in specs:
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(png(w, h, kx, ky, seed, px, py, delta))
        print(f"wrote {path} {w}x{h} ({os.path.getsize(path)} bytes)")

if __name__ == "__main__":
    main()
