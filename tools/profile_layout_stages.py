"""Stage-isolated wall timing of the layout interpreter on the real
corpus: lex+interpret (_text_runs) vs assembly (_reading_frame +
_xy_cut + line emit) vs full page_text. Best-of-N, no profiler."""
import sys, os, time, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pdf2dataset_spark.sources import minipdf
from pdf2dataset_spark.sources.minipdf import (
    PdfDocument, _text_runs, _rotate_runs, _reading_frame,
    _display_frame, _xy_cut, _layout_lines, page_rotation,
    page_media_box,
)

CORPUS = [
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
]

# pre-open docs and gather per-page inputs so stage timings exclude open()
pages = []
for p in CORPUS:
    doc = PdfDocument(open(p, "rb").read())
    for pg in doc.pages():
        pages.append((
            doc.page_content(pg), doc.page_fonts(pg),
            page_rotation(doc, pg), page_media_box(doc, pg),
            doc.page_forms(pg), doc.page_ext_gstates(pg),
            doc.page_properties(pg),
        ))
print(f"{len(pages)} pages")

def best(fn, n=7):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b

def stage_runs():
    for c, f, rot, mb, forms, gs, props in pages:
        _text_runs(c, f, forms, ext_gstates=gs, props=props)

def stage_full():
    sha = hashlib.sha256()
    for c, f, rot, mb, forms, gs, props in pages:
        for t in _layout_lines(c, f, rot, mb, forms, gs, props):
            sha.update(t[2].encode())
    return sha.hexdigest()

# assembly = full - runs, measured directly on pre-computed runs
pre = []
for c, f, rot, mb, forms, gs, props in pages:
    pre.append((_text_runs(c, f, forms, ext_gstates=gs, props=props), rot, mb))

def stage_assembly():
    import copy
    for runs, rot, mb in pre:
        rs = [dict(r) for r in runs]  # _reading_frame mutates in place
        rs = _reading_frame(_rotate_runs(rs, rot, mb),
                            frame=_display_frame(rot, mb))
        if not rs:
            continue
        sizes = sorted(r["size"] for r in rs)
        _xy_cut(rs, sizes[len(sizes) // 2])

print(f"sha16: {stage_full.__call__() if False else ''}")
h = hashlib.sha256()
for c, f, rot, mb, forms, gs, props in pages:
    for t in _layout_lines(c, f, rot, mb, forms, gs, props):
        h.update(t[2].encode())
print("lines sha:", h.hexdigest()[:16])

t_runs = best(stage_runs)
t_full = best(stage_full)
t_asm = best(stage_assembly)
n = len(pages)
print(f"_text_runs (lex+interpret): {t_runs*1000:.1f} ms  ({t_runs*1000/n:.3f} ms/page)")
print(f"assembly (copy+frame+xycut): {t_asm*1000:.1f} ms  ({t_asm*1000/n:.3f} ms/page)")
print(f"full _layout_lines:          {t_full*1000:.1f} ms  ({t_full*1000/n:.3f} ms/page)")
