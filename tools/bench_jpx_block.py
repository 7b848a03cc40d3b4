"""Micro-bench: JPX tier-1 decode of dense code-blocks.

Builds deterministic dense coefficient blocks (every magnitude
non-zero, mixed planes — the scanned-page worst case the round-11
verdict called the per-page ceiling), encodes them once, then times
``decode_codeblock`` and checks the round-trip stays exact.

Usage: python tools/bench_jpx_block.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pdf2dataset_spark.sources.jpx import decode_codeblock, encode_codeblock


def dense_block(w: int, h: int, seed: int = 7):
    """Deterministic dense signed coefficients (LCG; no random)."""
    out = []
    s = seed
    for _ in range(w * h):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        mag = (s >> 8) % 512  # up to 9 bit-planes, ~0.2% zeros
        out.append(-mag if s & 1 else mag)
    return out


def sparse_block(w: int, h: int, seed: int = 11):
    """~90% zeros — the early-plane / high-frequency band shape."""
    out = []
    s = seed
    for _ in range(w * h):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        mag = (s >> 8) % 512 if (s >> 3) % 10 == 0 else 0
        out.append(-mag if s & 1 else mag)
    return out


CASES = [
    ("dense 64x64 x16 (256^2 region)", 64, 64, dense_block, 16),
    ("dense 256x256", 256, 256, dense_block, 1),
    ("sparse 64x64 x16", 64, 64, sparse_block, 16),
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for name, w, h, gen, nblocks in CASES:
        coeffs = gen(w, h)
        data, npasses, nplanes = encode_codeblock(coeffs, w, h, "LL")
        got = decode_codeblock(data, w, h, "LL", nplanes, npasses)
        assert list(got) == coeffs, f"round-trip mismatch for {name}"
        best = float("inf")
        for _ in range(reps):
            t0 = time.process_time()
            for _ in range(nblocks):
                decode_codeblock(data, w, h, "LL", nplanes, npasses)
            best = min(best, time.process_time() - t0)
        print(f"{name}: {best*1000:.1f} ms  "
              f"({npasses} passes, {nplanes} planes)")


if __name__ == "__main__":
    main()
