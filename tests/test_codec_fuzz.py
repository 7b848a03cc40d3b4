"""Mutation fuzz over the image codecs' decode surfaces.

At corpus scale every decoder sees corrupt bytes; the contract is:
decode either succeeds or raises a ValueError-family error that the
extraction layer's error capture turns into an error row — never an
unexpected exception class, never a hang. This suite authors valid
streams with the repo's own encoders, then mutates/truncates them and
asserts that contract. (Pure-codec: no Spark.)

The time budget per decode guards the MQ-feeds-1-bits-forever class:
a mutated stream must fail or finish fast, not spin (the
symbol-dictionary progress guards exist because of exactly this)."""

import random
import struct
import time

from pdf2dataset_spark.sources import ccitt, jbig2, jpeg, jpx

_BUDGET_S = 20.0  # generous: slow machines, dense mutated bitmaps
struct_error = struct.error


def _contract(decode, payloads, rng, n_mutations):
    """Run decode over mutated payloads; ValueError-family or success
    only, within the time budget."""
    for base in payloads:
        cases = []
        for _ in range(n_mutations):
            b = bytearray(base)
            op = rng.randrange(3)
            if op == 0 and len(b) > 1:  # flip bytes
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1:  # truncate
                b = b[: rng.randrange(1, len(b))]
            else:  # splice garbage
                at = rng.randrange(len(b))
                b[at:at] = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 9))
                )
            cases.append(bytes(b))
        for data in cases:
            t0 = time.monotonic()
            try:
                decode(data)
            except ValueError:
                pass  # JBIG2Error/JPXError/plain ValueError: the contract
            except (IndexError, KeyError, struct_error, EOFError):
                # tolerated: the extraction layer catches these too
                pass
            took = time.monotonic() - t0
            assert took < _BUDGET_S, f"decode took {took:.1f}s on mutation"


class TestJBIG2Fuzz:
    def test_mutated_streams_fail_cleanly(self):
        rng = random.Random(101)
        bm = [
            bytearray(1 if rng.random() < 0.3 else 0 for _ in range(40))
            for _ in range(25)
        ]
        glyph = [bytearray([1, 1, 1]), bytearray([1, 0, 1])]
        text, _ = jbig2.encode_text_page(
            [glyph, [bytearray([1, 1])]], [(0, 2, 2), (1, 10, 5)], 30, 12
        )
        huff_u, _ = jbig2.encode_huffman_text_page(
            [glyph, [bytearray([1, 1])]], [(0, 2, 2), (1, 10, 5)], 30, 12
        )
        huff_m, _ = jbig2.encode_huffman_text_page(
            [glyph, [bytearray([1, 1])]], [(0, 2, 2), (1, 10, 5)], 30, 12,
            collective="mmr", custom_dw=True,
        )
        payloads = [
            jbig2.encode_generic_page(bm),
            jbig2.encode_generic_page(bm, template=2, tpgdon=True),
            jbig2.encode_generic_page(bm, mmr=True),
            text,
            huff_u,
            huff_m,
        ]
        # bound the work a mutated-but-valid header can demand: the
        # budget asserts NO-PROGRESS loops, not large bounded decodes
        # (the max_pixels knob is the production cap for that)
        def decode(data):
            return jbig2.decode_jbig2_gray(data, max_pixels=1 << 22)

        _contract(decode, payloads, rng, 40)


class TestJPXFuzz:
    def test_mutated_streams_fail_cleanly(self):
        rng = random.Random(202)
        px = bytes(rng.randrange(256) for _ in range(24 * 18))
        rgb = bytes(rng.randrange(256) for _ in range(16 * 12 * 3))
        payloads = [
            jpx.encode_jpx(24, 18, px, 1, levels=2),
            jpx.encode_jpx(24, 18, px, 1, levels=2, jp2=True),
            jpx.encode_jpx(16, 12, rgb, 3, levels=1),
            jpx.encode_jpx(24, 18, px, 1, levels=2, irreversible=True),
            jpx.encode_jpx(16, 12, rgb, 3, levels=1, irreversible=True,
                           quant_style="derived"),
            jpx.encode_jpx(24, 18, px, 1, levels=2, layers=3,
                           tile_size=(12, 9), sop=True, eph=True),
        ]
        _contract(jpx.decode_jpx, payloads, rng, 40)


class TestCcittFuzz:
    def test_mutated_streams_fail_cleanly(self):
        rng = random.Random(303)
        px = bytes(0 if rng.random() < 0.3 else 255 for _ in range(48 * 20))
        payloads = [
            ccitt.encode_g4(px, 48, 20),
            ccitt.encode_g3_1d(px, 48, 20),
        ]

        def decode(data):
            ccitt.decode_ccitt_gray(data, k=-1, columns=48, rows=20)
            ccitt.decode_ccitt_gray(data, k=0, columns=48, rows=20)

        _contract(decode, payloads, rng, 40)


class TestJpegFuzz:
    def test_mutated_streams_fail_cleanly(self):
        rng = random.Random(404)
        px = bytes(rng.randrange(256) for _ in range(32 * 16))
        cmyk = bytes(rng.randrange(256) for _ in range(16 * 12 * 4))
        payloads = [
            jpeg.encode_jpeg(32, 16, px, quality=80),
            jpeg.encode_jpeg_progressive(32, 16, px, quality=80),
            jpeg.encode_jpeg(16, 12, cmyk, quality=80, ncomp=4),
            jpeg.encode_jpeg(16, 12, cmyk, quality=80, ncomp=4,
                             adobe_transform=2),
        ]
        _contract(jpeg.decode_jpeg, payloads, rng, 40)
