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

def make_melody(name: str, rate: int, amp: int, freqs, seg_frames: int):
    """Piecewise-constant-pitch mono 'melody' (for the fingerprint ops:
    the per-window spectral peak changes over time, so landmark hashes
    are non-trivial). Phase restarts per segment — deterministic."""
    path = os.path.join(OUT, name)
    w = wave.open(path, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    frames = bytearray()
    for f in freqs:
        for i in range(seg_frames):
            v = int(amp * math.sin(2 * math.pi * f * i / rate))
            frames += struct.pack("<h", v)
    w.writeframes(bytes(frames))
    w.close()
    print(f"wrote {path} rate={rate} amp={amp} freqs={freqs} "
          f"({os.path.getsize(path)} bytes)")

def main():
    make("audio_doc_201.wav", 8000, 1, 800, 440.0)
    make("audio_doc_202.wav", 16000, 2, 1600, 220.0)
    make("audio_doc_203.wav", 44100, 1, 2205, 1000.0)
    # fingerprint fixtures: 401/402 play the SAME melody at different
    # volume (a spectral near-dup pair — peak sequences identical,
    # amplitudes not), 403 a different melody at the same rate whose
    # note-TRANSITION set is nearly disjoint from A's (landmark hashes
    # pair consecutive peaks, so shared transitions = shared hashes).
    # One note per 100-frame analysis window, frequencies on-bin
    # (bin width 8000/100 = 80 Hz).
    mel_a = [400.0, 640.0, 880.0, 560.0, 720.0, 400.0, 960.0, 480.0,
             800.0, 400.0, 640.0, 480.0, 880.0, 720.0, 560.0, 960.0]
    mel_b = [480.0, 720.0, 960.0, 640.0, 800.0, 480.0, 880.0, 400.0,
             560.0, 800.0, 720.0, 480.0, 640.0, 960.0, 400.0, 880.0]
    make_melody("mel_doc_401.wav", 8000, 12000, mel_a, 100)
    make_melody("mel_doc_402.wav", 8000, 9000, mel_a, 100)
    make_melody("mel_doc_403.wav", 8000, 12000, mel_b, 100)

if __name__ == "__main__":
    main()
