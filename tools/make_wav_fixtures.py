#!/usr/bin/env python3
"""Generate small deterministic PCM WAV fixtures (pure stdlib: wave +
struct — no audio libs). Canonical 44-byte headers so the oracle can read
channels / sample rate / frame counts straight from fixed offsets.
Dev tool only.
"""
import wave, struct, os, math

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "blobs")

def make(name: str, rate: int, channels: int, n_frames: int, freq: float):
    path = os.path.join(OUT, name)
    w = wave.open(path, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)  # 16-bit PCM
    w.setframerate(rate)
    frames = bytearray()
    for i in range(n_frames):
        v = int(12000 * math.sin(2 * math.pi * freq * i / rate))
        for _ in range(channels):
            frames += struct.pack("<h", v)
    w.writeframes(bytes(frames))
    w.close()
    print(f"wrote {path} rate={rate} ch={channels} frames={n_frames} "
          f"({os.path.getsize(path)} bytes)")

def main():
    make("audio_doc_201.wav", 8000, 1, 800, 440.0)
    make("audio_doc_202.wav", 16000, 2, 1600, 220.0)
    make("audio_doc_203.wav", 44100, 1, 2205, 1000.0)

if __name__ == "__main__":
    main()
