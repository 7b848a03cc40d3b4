"""Profile open+page_text on the real corpus + bench fixtures."""
import cProfile, pstats, io, sys, os, time, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pdf2dataset_spark.sources import minipdf
from pdf2dataset_spark.sources.codecs import PdfCodec

CORPUS = [
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
]

codec = PdfCodec()

def run_corpus(n=1):
    sha = hashlib.sha256()
    pages = 0
    for _ in range(n):
        for p in CORPUS:
            data = open(p, "rb").read()
            h = codec.open(data)
            for pg in range(1, codec.page_count(h) + 1):
                t = codec.page_text(h, pg)
                sha.update(t.encode())
                pages += 1
    return pages, sha.hexdigest()

# warmup + sha
pages, digest = run_corpus()
print(f"pages={pages} sha={digest[:16]}")

# wall timing best-of-7
best = float("inf")
for _ in range(7):
    t0 = time.perf_counter()
    run_corpus()
    w = time.perf_counter() - t0
    best = min(best, w)
print(f"corpus wall best: {best*1000:.1f} ms total, {best*1000/pages:.3f} ms/page")

pr = cProfile.Profile()
pr.enable()
run_corpus(3)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
ps.print_stats(30)
print(s.getvalue())
