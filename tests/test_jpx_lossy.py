"""Lossy (9/7 irreversible + scalar quantization) JPEG 2000 tests.

The 9/7 lifting implementation is validated against the NORMATIVE
T.800 Table F.4 convolution filter taps — an independent published
formulation of the same transform — so a swapped scaling constant or
pass order cannot hide behind a self-consistent encode/decode round
trip (the blind spot the round-5 5/3 review caught).
"""

import numpy as np
import pytest

from pdf2dataset_spark.sources import minipdf
from pdf2dataset_spark.sources.jpx import (
    DWT97_ANALYSIS_HIGH,
    DWT97_ANALYSIS_LOW,
    JPXError,
    _delta_to_eps_mu,
    _dwt97_forward_2d_np,
    _dwt97_forward_axis,
    _dwt97_inverse_2d_np,
    _dwt97_inverse_axis,
    _quant_delta,
    decode_jpx,
    decode_jpx_gray,
    encode_jpx,
)


def _ext(x, i):
    """Whole-sample symmetric extension (T.800 F.3.7)."""
    n = len(x)
    if n == 1:
        return x[0]
    p = 2 * n - 2
    i = abs(i) % p
    return x[p - i] if i >= n else x[i]


def _conv_analysis(x):
    """Direct convolution with the Table F.4 taps."""
    n = len(x)
    nlo = (n + 1) // 2
    h, g = DWT97_ANALYSIS_LOW, DWT97_ANALYSIS_HIGH
    low = [
        sum(h[abs(k)] * _ext(x, 2 * m + k) for k in range(-4, 5))
        for m in range(nlo)
    ]
    high = [
        sum(g[abs(k)] * _ext(x, 2 * m + 1 + k) for k in range(-3, 4))
        for m in range(n - nlo)
    ]
    return np.array(low + high)


class TestDwt97:
    def test_lifting_matches_convolution(self):
        rng = np.random.default_rng(11)
        for n in (2, 3, 5, 8, 16, 17, 33, 64):
            x = rng.normal(size=n) * 100
            lift = _dwt97_forward_axis(x[None, :].copy(), n)[0]
            conv = _conv_analysis(list(x))
            assert np.allclose(lift, conv, atol=1e-9), n

    def test_1d_round_trip(self):
        rng = np.random.default_rng(12)
        for n in (1, 2, 3, 7, 20, 65):
            x = rng.normal(size=(3, n)) * 50
            f = _dwt97_forward_axis(x.copy(), n)
            b = _dwt97_inverse_axis(f, n)
            assert np.allclose(b, x, atol=1e-9), n

    def test_2d_multilevel_round_trip(self):
        rng = np.random.default_rng(13)
        for w, h, lv in ((13, 9, 2), (64, 64, 3), (7, 1, 2), (1, 9, 3),
                         (33, 17, 4), (1, 1, 2)):
            p = rng.normal(size=(h, w)) * 50
            f = _dwt97_forward_2d_np(p.copy(), w, h, lv)
            b = _dwt97_inverse_2d_np(f.copy(), w, h, lv)
            assert np.allclose(b, p, atol=1e-8), (w, h, lv)

    def test_lifting_matches_convolution_odd_phase(self):
        """Round-10: the ODD lifting phase (canvas-offset streams)
        against the same independent Table F.4 convolution
        formulation — low samples sit at even ABSOLUTE positions,
        so the band counts swap and the boundary folds reflect
        about the absolute signal edges."""
        from pdf2dataset_spark.sources.jpx import (
            DWT97_ANALYSIS_HIGH,
            DWT97_ANALYSIS_LOW,
        )

        rng = np.random.default_rng(21)
        for n in (2, 3, 5, 8, 16, 17, 33):
            x = rng.normal(size=n) * 100

            def xa(i):
                j = i - 1  # absolute interval [1, 1+n)
                while not (0 <= j < n):
                    j = -j if j < 0 else 2 * (n - 1) - j
                return x[j]

            i0, i1 = 1, 1 + n
            conv_low = [
                sum(DWT97_ANALYSIS_LOW[abs(t)] * xa(2 * k + t)
                    for t in range(-4, 5))
                for k in range((i0 + 1) // 2, (i1 + 1) // 2)
            ]
            conv_high = [
                sum(DWT97_ANALYSIS_HIGH[abs(t)] * xa(2 * k + 1 + t)
                    for t in range(-3, 4))
                for k in range(i0 // 2, i1 // 2)
            ]
            lift = _dwt97_forward_axis(x[None, :].copy(), n, 1)[0]
            assert np.allclose(
                lift, np.array(conv_low + conv_high), atol=1e-9), n

    def test_odd_phase_roundtrip_and_single_sample_decline(self):
        from pdf2dataset_spark.sources.jpx import JPXUnsupported

        rng = np.random.default_rng(22)
        for n in (2, 3, 7, 20, 65):
            x = rng.normal(size=(3, n)) * 50
            f = _dwt97_forward_axis(x.copy(), n, 1)
            b = _dwt97_inverse_axis(f, n, 1)
            assert np.allclose(b, x, atol=1e-9), n
        # the one-sample odd window is a NAMED decline (F.3.4's rule
        # is published for the reversible path only — round-10
        # declines rather than guessing the 9/7 normalization)
        with pytest.raises(JPXUnsupported, match="single-sample"):
            _dwt97_forward_axis(np.ones((1, 1)), 1, 1)
        with pytest.raises(JPXUnsupported, match="single-sample"):
            _dwt97_inverse_axis(np.ones((1, 1)), 1, 1)

    def test_dc_gain_is_one(self):
        # Table F.4 low-pass sums to 1: a constant signal's LL stays
        # at that constant through every level
        p = np.full((32, 32), 77.0)
        f = _dwt97_forward_2d_np(p.copy(), 32, 32, 3)
        assert np.allclose(f[:4, :4], 77.0, atol=1e-9)


class TestQuantRepresentation:
    def test_eps_mu_round_trip(self):
        for delta in (0.03, 0.5, 1.0, 7.9, 250.0, 1e-4):
            eps, mu, dd = _delta_to_eps_mu(delta, 8, 1)
            assert 0 <= eps <= 31 and 0 <= mu < 2048
            assert abs(dd - delta) / delta < 1 / 2048
            assert dd == _quant_delta(8, 1, eps, mu)

    def test_out_of_range_steps_clamp(self):
        eps, mu, dd = _delta_to_eps_mu(1e-12, 8, 0)  # finer than 2^-23
        assert (eps, mu) == (31, 0)
        eps, mu, dd = _delta_to_eps_mu(1e9, 8, 0)  # coarser than 2^8
        assert eps == 0 and mu == 2047


class TestLossyRoundTrip:
    def _err(self, orig: bytes, got: bytes):
        a = np.frombuffer(orig, np.uint8).astype(int)
        b = np.frombuffer(got, np.uint8).astype(int)
        return np.abs(a - b)

    def test_gray_gradient_near_exact(self):
        w, h = 61, 47
        g = np.fromfunction(lambda y, x: 40 + 2 * x + 1.5 * y, (h, w))
        px = np.clip(np.rint(g), 0, 255).astype(np.uint8).tobytes()
        data = encode_jpx(w, h, px, 1, levels=3, irreversible=True,
                          quality_bits=8)
        dw, dh, out = decode_jpx(data)
        assert (dw, dh) == (w, h)
        assert self._err(px, out).max() <= 1

    def test_gray_noise_quality_scales_error(self):
        rng = np.random.default_rng(14)
        w, h = 40, 33
        px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        errs = []
        for q in (4, 7, 10):
            data = encode_jpx(w, h, px, 1, levels=2, irreversible=True,
                              quality_bits=q)
            errs.append(self._err(px, decode_jpx(data)[2]).max())
        assert errs[0] >= errs[1] >= errs[2]
        assert errs[2] <= 1  # 10 magnitude bits ≈ visually lossless

    def test_color_ict_round_trip(self):
        cw, ch = 24, 18
        rgb = bytes(
            v for y in range(ch) for x in range(cw)
            for v in (x * 255 // (cw - 1), y * 255 // (ch - 1),
                      (x + y) * 255 // (cw + ch - 2))
        )
        data = encode_jpx(cw, ch, rgb, 3, levels=2, irreversible=True,
                          quality_bits=8)
        assert self._err(rgb, decode_jpx(data)[2]).max() <= 2

    def test_derived_quant_style(self):
        w, h = 30, 25
        rng = np.random.default_rng(15)
        px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        data = encode_jpx(w, h, px, 1, levels=2, irreversible=True,
                          quant_style="derived", quality_bits=9)
        # QCD must be the derived style: one 16-bit value
        at = data.index(b"\xff\x5c")
        length = int.from_bytes(data[at + 2:at + 4], "big")
        assert length == 2 + 1 + 2  # Lqcd + Sqcd + one Sqcd value
        assert data[at + 4] & 0x1F == 1
        assert self._err(px, decode_jpx(data)[2]).max() <= 2

    def test_jp2_container_lossy(self):
        w, h = 16, 12
        px = bytes((x * 16 + y) % 256 for y in range(h) for x in range(w))
        data = encode_jpx(w, h, px, 1, levels=2, irreversible=True,
                          jp2=True)
        assert decode_jpx(data)[:2] == (w, h)

    def test_deterministic(self):
        w, h = 21, 17
        px = bytes((x * y) % 256 for y in range(h) for x in range(w))
        a = encode_jpx(w, h, px, 1, levels=2, irreversible=True)
        b = encode_jpx(w, h, px, 1, levels=2, irreversible=True)
        assert a == b
        assert decode_jpx(a) == decode_jpx(b)

    def test_gray_helper_on_lossy_rgb(self):
        rgb = bytes(v for i in range(64) for v in (i * 4, i * 4, i * 4))
        data = encode_jpx(8, 8, rgb, 3, levels=1, irreversible=True,
                          quality_bits=10)
        w, h, gray = decode_jpx_gray(data)
        want = np.arange(64) * 4
        got = np.frombuffer(gray, np.uint8).astype(int)
        assert np.abs(got - want).max() <= 2

    def test_bad_quant_style_rejected(self):
        with pytest.raises(JPXError):
            encode_jpx(8, 8, bytes(64), 1, irreversible=True,
                       quant_style="nope")

    def test_odd_canvas_offsets_lossy(self):
        """Round-10: canvas offsets work on the LOSSY path at any
        phase (odd XO/YO shift the 9/7 lifting phase and the B-15
        band geometry). The reconstruction error must match the
        zero-offset encode of the same image — a mis-phased lifting
        would not just blur, it would scramble entire subbands."""
        w, h = 40, 28
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = ((np.sin(xx / 5.0) + np.cos(yy / 4.0)) * 55 + 128
               ).astype(np.uint8)
        px = img.tobytes()
        base = self._err(
            px, decode_jpx(encode_jpx(
                w, h, px, 1, levels=2, irreversible=True,
                quality_bits=9))[2]
        ).max()
        for xo, yo, ts in ((1, 0, None), (3, 5, None),
                           (3, 5, (24, 16)), (7, 7, (16, 16))):
            cs = encode_jpx(w, h, px, 1, levels=2, irreversible=True,
                            quality_bits=9, image_offset=(xo, yo),
                            tile_size=ts)
            gw, gh, out = decode_jpx(cs)
            assert (gw, gh) == (w, h), (xo, yo, ts)
            assert self._err(px, out).max() <= base + 2, (xo, yo, ts)
        # lossy offsets still deny ROI (the earlier reversible-only
        # ROI guard or the canvas guard — either is a refusal)
        with pytest.raises(JPXError, match="ROI"):
            encode_jpx(w, h, px, 1, irreversible=True,
                       image_offset=(3, 5), roi=(0, 0, 8, 8))

    def test_odd_offsets_with_subsampling_lossy(self):
        """Round-11 (the former decline): lossy 4:2:0 at ODD canvas
        offsets — each component's 9/7 phase follows its own
        ceil-division origin. On a smooth image the reconstruction
        error must match the zero-offset encode of the same image."""
        w, h = 24, 16
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        rgb = np.stack([
            (np.sin(xx / 6.0) * 50 + 128),
            (np.cos(yy / 5.0) * 50 + 128),
            ((xx + yy) * 3 + 40),
        ], axis=-1).astype(np.uint8)
        subs = ((1, 1), (2, 2), (2, 2))
        base = self._err(
            rgb.tobytes(), decode_jpx(encode_jpx(
                w, h, rgb.tobytes(), 3, levels=2, irreversible=True,
                quality_bits=9, subsampling=subs))[2]
        ).max()
        for xo, yo, ts in ((1, 0, None), (3, 5, None), (3, 5, (16, 16))):
            cs = encode_jpx(w, h, rgb.tobytes(), 3, levels=2,
                            irreversible=True, quality_bits=9,
                            subsampling=subs, image_offset=(xo, yo),
                            tile_size=ts)
            gw, gh, out = decode_jpx(cs)
            assert (gw, gh) == (w, h), (xo, yo, ts)
            assert self._err(rgb.tobytes(), out).max() <= base + 3, \
                (xo, yo, ts)


class TestMinipdfLossyIntegration:
    def test_page_images_decodes_lossy_jpx(self):
        rng = np.random.default_rng(16)
        w, h = 30, 22
        px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        data = encode_jpx(w, h, px, 1, levels=2, irreversible=True,
                          quality_bits=10)
        pdf = minipdf.build_pdf(
            [""],
            images=[{"filter": "/JPXDecode", "width": w, "height": h,
                     "data": data}],
        )
        (entry,) = minipdf.extract_page_images(pdf, decode_pixels=True)[0]
        assert entry["format"] == "jpx"
        assert entry["decodable"] is True
        assert entry["data"] == data
        got = np.frombuffer(entry["pixels"], np.uint8).astype(int)
        want = np.frombuffer(px, np.uint8).astype(int)
        assert np.abs(got - want).max() <= 1


class TestPerComponentQuantization:
    """QCC segments (A.6.5): chroma components quantized with their
    own coarser steps — the real-world chroma-subquality shape."""

    def test_qcc_round_trip_and_size(self):
        import numpy as np

        rng = np.random.default_rng(21)
        w, h = 32, 24
        rgb = rng.integers(0, 256, size=w * h * 3,
                           dtype=np.uint8).tobytes()
        d = encode_jpx(w, h, rgb, 3, levels=2, irreversible=True,
                       quality_bits=10, chroma_quality_bits=6)
        assert b"\xff\x5d" in d  # QCC segments present
        got = np.frombuffer(decode_jpx(d)[2], np.uint8).astype(int)
        want = np.frombuffer(rgb, np.uint8).astype(int)
        assert np.abs(got - want).max() <= 8  # chroma loss bounded
        d_flat = encode_jpx(w, h, rgb, 3, levels=2, irreversible=True,
                            quality_bits=10)
        assert len(d) < len(d_flat)  # coarser chroma really saves

    def test_qcc_luma_stays_fine(self):
        import numpy as np

        # gray content through the ICT: chroma ≈ 0, so coarse chroma
        # steps must not damage the luma reconstruction
        w, h = 24, 16
        gray3 = bytes(v for i in range(w * h)
                      for v in ((i * 7) % 256,) * 3)
        d = encode_jpx(w, h, gray3, 3, levels=2, irreversible=True,
                       quality_bits=10, chroma_quality_bits=4)
        got = np.frombuffer(decode_jpx(d)[2], np.uint8).astype(int)
        want = np.frombuffer(gray3, np.uint8).astype(int)
        assert np.abs(got - want).max() <= 1

    def test_qcc_requires_rgb_and_expounded(self):
        with pytest.raises(JPXError):
            encode_jpx(8, 8, bytes(64), 1, irreversible=True,
                       chroma_quality_bits=6)
        rgb = bytes(192)
        with pytest.raises(JPXError):
            encode_jpx(8, 8, rgb, 3, irreversible=True,
                       quant_style="derived", chroma_quality_bits=6)

    def test_coc_handling(self):
        import struct

        from pdf2dataset_spark.sources.jpx import JPXUnsupported

        base = bytearray(encode_jpx(8, 8, bytes(range(64)), 1, levels=1))
        cod_at = bytes(base).index(b"\xff\x52")
        cod_len = int.from_bytes(base[cod_at + 2:cod_at + 4], "big")
        at = cod_at + 2 + cod_len
        # a redundant COC restating the COD is tolerated
        coc = bytes([0, 0, 1, 4, 4, 0, 1])
        data = bytearray(base)
        data[at:at] = b"\xff\x53" + struct.pack(">H", len(coc) + 2) + coc
        assert decode_jpx(bytes(data))[2] == bytes(range(64))
        # a COC that DIFFERS from the COD in levels now DECODES
        # (round-8: per-component coding styles) — but the QCD must
        # then carry enough subband exponents for the deeper
        # decomposition, else the stream is malformed
        coc2 = bytes([0, 0, 3, 4, 4, 0, 1])  # levels 3 vs COD's 1
        data = bytearray(base)
        data[at:at] = b"\xff\x53" + struct.pack(">H", len(coc2) + 2) + coc2
        with pytest.raises(JPXError, match="exponent list shorter"):
            decode_jpx(bytes(data))
        # round-10: an A.6.1-LEGAL differing code-block size PARSES
        # (32x32 here); this patched stream's body was coded with
        # 64x64 blocks, so the decode either fails typed or decodes
        # mismatched data — never an unnamed crash
        coc3 = bytes([0, 0, 1, 3, 3, 0, 1])  # 32x32 blocks
        data = bytearray(base)
        data[at:at] = b"\xff\x53" + struct.pack(">H", len(coc3) + 2) + coc3
        try:
            decode_jpx(bytes(data))
        except JPXError:
            pass
        # an A.6.1-ILLEGAL size (2^12 wide: xcb=10+2? byte 10 ->
        # exponent 12) still refuses by name
        coc4 = bytes([0, 0, 1, 11, 3, 0, 1])
        data = bytearray(base)
        data[at:at] = b"\xff\x53" + struct.pack(">H", len(coc4) + 2) + coc4
        with pytest.raises(JPXError):
            decode_jpx(bytes(data))
        # a truncated COC is malformed
        data = bytearray(base)
        data[at:at] = b"\xff\x53" + b"\x00\x04" + b"\x00\x00"
        with pytest.raises(JPXError):
            decode_jpx(bytes(data))
