"""Property-based tests (hypothesis) for operator invariants —
beyond the upstream's example-based style (SURVEY §5.1 notes no
property testing upstream; the invariants here hold at any scale).

One shared strategy note: Spark round-trips are slow, so each
property runs on a small number of generated examples with
deadline disabled.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from pdf2dataset_spark.operators import dedup as dd
from pdf2dataset_spark.operators import text as tx

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
TEXT = st.lists(WORD, min_size=1, max_size=20).map(" ".join)

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@prop
@given(texts=st.lists(TEXT, min_size=1, max_size=8))
def test_exact_dedup_idempotent_and_complete(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dd.exact_dedup(df)
    twice = dd.exact_dedup(once.select("doc_id", "text"))
    n_once, n_twice = once.count(), twice.count()
    # Idempotent: dedup of a deduped set is a no-op.
    assert n_once == n_twice
    # Complete: one survivor per distinct normalized text.
    n_distinct = df.select(dd.normalize_text("text")).distinct().count()
    assert n_once == n_distinct


@prop
@given(text=TEXT)
def test_shingles_bounded_by_tokens(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        F.size(dd.shingles("text", 3)).alias("n_sh"),
        F.size(F.split("text", " ")).alias("n_tok"),
    ).collect()[0]
    assert 1 <= row.n_sh <= max(row.n_tok - 2, 1)


@prop
@given(a=TEXT, b=TEXT)
def test_jaccard_symmetric_bounded(spark, a, b):
    df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
    sh = df.withColumn("sh", dd.shingles("text", 2))
    # candidates path: scores the given pair even at J=0 (the blocked
    # co-occurrence plan requires threshold > 0 by design)
    cand = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    pairs = dd.jaccard_pairs(
        sh, "id", "sh", threshold=-1.0, candidates=cand
    ).collect()
    assert len(pairs) == 1
    j = pairs[0].jaccard
    assert 0.0 <= j <= 1.0
    if a == b:
        assert j == 1.0


@prop
@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=8).map(lambda ws: list(set(ws))),
        min_size=2,
        max_size=6,
    ),
    threshold=st.sampled_from([0.2, 0.5, 0.8]),
)
def test_jaccard_cooccurrence_matches_bruteforce(spark, docs, threshold):
    """The shuffle-minimal co-occurrence plan must produce EXACTLY the
    pairs a brute-force set computation does, at any threshold."""
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, sh array<string>")
    got = {
        (r.id1, r.id2): r.jaccard
        for r in dd.jaccard_pairs(df, "id", "sh", threshold=threshold).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                sa, sb = set(a), set(b)
                jac = len(sa & sb) / len(sa | sb)
                if jac >= threshold:
                    want[(i, j)] = jac
    assert got.keys() == want.keys(), (got, want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


@prop
@given(text=TEXT)
def test_quality_features_consistency(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = tx.quality_features(df).collect()[0]
    assert row.q_n_chars == len(text)
    assert row.q_n_tokens == len(text.split(" "))
    assert 0.0 < row.q_type_token_ratio <= 1.0


@prop
@given(
    texts=st.lists(TEXT, min_size=1, max_size=6),
    window=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_tokens_reconstruction_invariant(spark, texts, window, overlap_frac):
    """For ANY window/overlap, dropping the overlap prefix from every
    chunk after the first reproduces the document token stream, and no
    chunk exceeds the window."""
    overlap = min(int(window * overlap_frac), window - 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = tx.chunk_tokens(df, window=window, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        assert r.chunk_tokens <= window
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, t in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt += c.split(" ")[overlap:]
        assert rebuilt == t.split(" "), (t, window, overlap, chunks)


@prop
@given(keys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60))
def test_cms_never_undercounts_property(spark, keys):
    from collections import Counter

    from pdf2dataset_spark.operators import sketch as sk

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    cms = sk.cms_build(df, "k", depth=3, width=64)
    est = {
        r.k: r.est_cnt
        for r in sk.cms_estimate(
            cms, df.select("k").distinct(), "k", depth=3, width=64
        ).collect()
    }
    truth = Counter(keys)
    for k, n in truth.items():
        assert est[k] >= n, (k, n, est[k])


@prop
@given(
    pages=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=3,
    ),
    password=st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=8
    ),
    rev=st.sampled_from([3, 4]),
)
def test_encrypted_pdf_roundtrip_property(pages, password, rev):
    """For ANY printable page text, password, and legacy revision, an
    encrypted build must hide the plaintext yet extract exactly with
    the right password (R6 is covered by fixed tests — Algorithm 2.B
    is too slow for a hypothesis loop)."""
    from pdf2dataset_spark.sources import minipdf

    norm = [p.replace("\r", " ") for p in pages]
    data = minipdf.build_pdf(norm, encrypt=password, encrypt_rev=rev)
    for p in norm:
        if len(p) >= 8:
            assert p.encode("latin-1") not in data
    doc = minipdf.PdfDocument(
        data, password=password.encode("latin-1", errors="replace")
    )
    got = [minipdf.content_text(doc.page_content(pg)) for pg in doc.pages()]
    assert got == norm


@prop
@given(
    entries=st.dictionaries(
        st.integers(min_value=1, max_value=0xFFFF),
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FFF),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_tounicode_cmap_roundtrip_property(entries):
    """For ANY code→text mapping, a generated bfchar CMap must parse
    back to exactly that mapping with 2-byte codes."""
    from pdf2dataset_spark.sources import minipdf

    bf = "".join(
        f"<{code:04X}> <{dst.encode('utf-16-be').hex()}>\n"
        for code, dst in entries.items()
    )
    cmap = (
        "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        f"endcodespacerange\n{len(entries)} beginbfchar\n{bf}endbfchar\n"
        "endcmap"
    ).encode("ascii")
    mapping, code_len = minipdf.parse_tounicode_cmap(cmap)
    assert code_len == 2
    assert mapping == entries


class TestLayoutProperties:
    """Layout-engine conservation laws (round 6): whatever the
    positioning operators do, reading order must PERMUTE the shown
    text, never lose or duplicate it."""

    @given(
        st.lists(
            st.tuples(
                # a 24-unit grid keeps distinct placements farther
                # apart than the overprint-dedup radius (0.15 em)
                st.integers(0, 25).map(lambda v: v * 24),   # x
                st.integers(0, 31).map(lambda v: v * 24),   # y
                st.sampled_from(["alpha", "bv", "word here", "x 1 z"]),
            ),
            min_size=0,
            max_size=12,
            unique_by=lambda p: (p[0], p[1]),
        ),
        st.sampled_from([0, 1, 2, 3]),          # page rotation quadrant
    )
    @settings(max_examples=60, deadline=None)
    def test_tokens_conserved_under_any_placement(self, placements, quad):
        from pdf2dataset_spark.sources import minipdf

        mats = {
            0: b"1 0 0 1 %d %d Tm",
            1: b"0 1 -1 0 %d %d Tm",
            2: b"-1 0 0 -1 %d %d Tm",
            3: b"0 -1 1 0 %d %d Tm",
        }
        ops = [b"BT", b"/F1 12 Tf"]
        expect_chars: list[str] = []
        for x, y, text in placements:
            ops.append(mats[quad] % (x, y))
            ops.append(b"(" + text.encode() + b") Tj")
            expect_chars.extend(c for c in text if not c.isspace())
        ops.append(b"ET")
        # The TRUE invariant is CHARACTER conservation: reading order
        # may merge adjacent runs into one word (continuation runs
        # like 'Hel'+'lo' are one word) or insert word breaks, but no
        # glyph may be lost or duplicated.
        out = minipdf.content_text_layout(b"\n".join(ops))
        got = [c for c in out if not c.isspace()]
        assert sorted(got) == sorted(expect_chars)
        # word boxes carry the same character multiset
        boxes = minipdf.content_word_boxes(b"\n".join(ops))
        box_chars = [c for b in boxes for c in b["word"]]
        assert sorted(box_chars) == sorted(expect_chars)

    @given(st.lists(st.sampled_from(
        ["plain line", "another one", "", "third body text"]),
        min_size=1, max_size=6))
    @settings(max_examples=30, deadline=None)
    def test_layout_equals_stream_for_build_pdf(self, pages):
        from pdf2dataset_spark.sources import minipdf

        pdf = minipdf.build_pdf([p or " " for p in pages])
        assert minipdf.extract_page_texts(pdf) == \
            minipdf.extract_page_texts(pdf, layout=True)


class TestOverprintDedup:
    """Fake-bold double-draw (same text at ~the same position) is
    emitted ONCE, matching pdftotext; distinct overlapping runs
    separate with a space instead of fusing."""

    def test_fake_bold_dedups(self):
        from pdf2dataset_spark.sources import minipdf

        ops = [b"BT", b"/F1 12 Tf",
               b"1 0 0 1 72 700 Tm", b"(bold text) Tj",
               b"1 0 0 1 72.4 700 Tm", b"(bold text) Tj", b"ET"]
        assert minipdf.content_text_layout(b"\n".join(ops)) == "bold text"
        words = [b["word"] for b in
                 minipdf.content_word_boxes(b"\n".join(ops))]
        assert words == ["bold", "text"]

    def test_distinct_overlaps_get_a_space(self):
        from pdf2dataset_spark.sources import minipdf

        ops = [b"BT", b"/F1 12 Tf",
               b"1 0 0 1 72 700 Tm", b"(alpha) Tj",
               b"1 0 0 1 72 700 Tm", b"(beta) Tj", b"ET"]
        out = minipdf.content_text_layout(b"\n".join(ops))
        assert sorted(out.split()) == ["alpha", "beta"]

    def test_continuation_fragments_stay_one_word(self):
        # narrow-font kern fragments: second run starts inside the
        # first's ESTIMATED extent but past its start — continuation
        from pdf2dataset_spark.sources import minipdf

        ops = [b"BT", b"/F1 12 Tf", b"1 0 0 1 72 700 Tm", b"(milli) Tj",
               b"1 0 0 1 86 700 Tm", b"(meter) Tj", b"ET"]
        assert minipdf.content_text_layout(b"\n".join(ops)) == "millimeter"

    def test_same_value_on_tight_baselines_survives(self):
        from pdf2dataset_spark.sources import minipdf

        ops = [b"BT", b"/F1 12 Tf", b"1 0 0 1 72 700 Tm", b"(100) Tj",
               b"1 0 0 1 72 695 Tm", b"(100) Tj", b"ET"]
        out = minipdf.content_text_layout(b"\n".join(ops))
        assert out.count("100") == 2


class TestDwtPhaseProperties:
    """Round-10: phase-aware DWT invariants under hypothesis — the
    parametrized unit tests cover chosen shapes; these sweep random
    signals, dims, levels and ORIGINS (the canvas-offset phase)."""

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 40),
        ph=st.integers(0, 1),
        data=st.data(),
    )
    def test_53_1d_identity_any_phase(self, n, ph, data):
        from pdf2dataset_spark.sources import jpx

        x = data.draw(st.lists(
            st.integers(-4000, 4000), min_size=n, max_size=n))
        lo, hi = jpx._dwt53_forward_1d(x, ph)
        # band sizes = #even / #odd absolute positions in [ph, ph+n)
        assert len(lo) == ((n + 1) // 2 if ph == 0 else n // 2)
        assert len(lo) + len(hi) == n
        assert jpx._dwt53_inverse_1d(lo, hi, ph) == x

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 17),
        h=st.integers(1, 17),
        lv=st.integers(1, 4),
        ox=st.integers(0, 9),
        oy=st.integers(0, 9),
        data=st.data(),
    )
    def test_53_2d_identity_and_np_twin_any_origin(
            self, w, h, lv, ox, oy, data):
        import numpy as np

        from pdf2dataset_spark.sources import jpx

        rows = [
            data.draw(st.lists(
                st.integers(-255, 255), min_size=w, max_size=w))
            for _ in range(h)
        ]
        plane = jpx.dwt53_forward_2d(rows, lv, (ox, oy))
        assert jpx.dwt53_inverse_2d(plane, w, h, lv, (ox, oy)) == rows
        arr = np.array(plane, np.int64).reshape(h, w)
        assert jpx._dwt53_inverse_2d_np(
            arr, w, h, lv, (ox, oy)).tolist() == rows

    @settings(max_examples=40, deadline=None)
    @given(
        x0=st.integers(0, 33),
        y0=st.integers(0, 33),
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        lv=st.integers(1, 5),
    )
    def test_band_geometry_tiles_the_plane(self, x0, y0, w, h, lv):
        """Every resolution's bands tile the plane layout exactly:
        sizes are non-negative, the r-0 LL plus each level's
        HL/LH/HH partition the level window, and the per-band
        absolute origins agree with the closed-form B-15."""
        import math

        from pdf2dataset_spark.sources import jpx

        for r in range(lv + 1):
            bands = jpx._bands_for_resolution(w, h, lv, r, (x0, y0))
            origs = jpx._band_abs_origins(w, h, lv, r, (x0, y0))
            assert len(bands) == len(origs)
            for (name, bx, by, bw, bh), (abx, aby) in zip(bands, origs):
                assert bw >= 0 and bh >= 0
                if r == 0:
                    continue
                lev = lv - r + 1
                xob = 1 if name in ("HL", "HH") else 0
                yob = 1 if name in ("LH", "HH") else 0
                tb = lambda t0, t1, ob: (
                    math.ceil((t0 - (1 << (lev - 1)) * ob) / (1 << lev)),
                    math.ceil((t1 - (1 << (lev - 1)) * ob) / (1 << lev)),
                )
                ex0, ex1 = tb(x0, x0 + w, xob)
                ey0, ey1 = tb(y0, y0 + h, yob)
                assert (bw, bh) == (ex1 - ex0, ey1 - ey0), (name, r)
                assert (abx, aby) == (ex0, ey0), (name, r)
            if r > 0:
                # the three bands + the next LL partition the window
                lev = lv - r + 1
                wins = jpx._level_windows(x0, y0, w, h, lv)
                px0, py0, px1, py1 = wins[lev - 1]
                area = sum(bw * bh for _, _, _, bw, bh in bands)
                ll = jpx._level_windows(x0, y0, w, h, lv)[lev]
                ll_area = (ll[2] - ll[0]) * (ll[3] - ll[1])
                assert area + ll_area == (px1 - px0) * (py1 - py0)
