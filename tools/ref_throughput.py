"""Reproduces BASELINE.md's head-to-head ingest throughput measurement:
the reference's single-threaded ``parse_file`` vs this engine's
detector/normalizer pipeline over the same replicated fixture corpus.

Requires the reference checkout at /root/reference (read-only). Its bs4
dependency is satisfied with a minimal stdlib shim implementing the
subset it uses (find/find_all/get_text) - faster than real bs4, so the
reference's number is flattered, never hurt.

Usage: python tools/ref_throughput.py [N_DOCS]
"""
import os
import importlib.util, sys, time, types
from html.parser import HTMLParser

# --- minimal bs4 shim (stdlib), enough for etl_parser's usage ---
class _Node:
    def __init__(self, name, parent=None):
        self.name, self.parent, self.children, self._text = name, parent, [], []
    def find(self, name):
        for n in self._walk():
            if n.name == name: return n
        return None
    def find_all(self, names):
        if isinstance(names, str): names = [names]
        return [n for n in self._walk() if n.name in names]
    def _walk(self):
        for c in self.children:
            yield c
            yield from c._walk()
    def get_text(self, strip=False, separator=""):
        parts = []
        def rec(n):
            parts.extend(n._text)
            for c in n.children: rec(c)
        rec(self)
        t = separator.join(parts)
        return t.strip() if strip else t

class _Soup(_Node, HTMLParser):
    def __init__(self, text, _flavor=None):
        _Node.__init__(self, "[document]")
        HTMLParser.__init__(self)
        self._cur = self
        self.feed(text)
    def handle_starttag(self, tag, attrs):
        n = _Node(tag, self._cur); self._cur.children.append(n); self._cur = n
    def handle_endtag(self, tag):
        c = self._cur
        while c is not self and c.name != tag: c = c.parent
        if c is not self: self._cur = c.parent or self
    def handle_data(self, data):
        self._cur._text.append(data)

bs4 = types.ModuleType("bs4"); bs4.BeautifulSoup = _Soup
sys.modules["bs4"] = bs4
# ----------------------------------------------------------------

REF = os.environ.get("AURAVERSE_REFERENCE", "/root/reference/etl_parser.py")
if not os.path.exists(REF):
    sys.exit(f"reference not found at {REF}; set AURAVERSE_REFERENCE")
spec = importlib.util.spec_from_file_location("ref_etl", REF)
ref = importlib.util.module_from_spec(spec)
sys.modules["ref_etl"] = ref  # dataclasses needs the module registered
spec.loader.exec_module(ref)
text1 = open(os.path.join(os.path.dirname(REF), "input.txt")).read()
text2 = open(os.path.join(os.path.dirname(REF), "input2.txt")).read()
out = ref.parse_file(text1)
print("ref parse keys:", sorted(out.keys()) if isinstance(out, dict) else type(out))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
docs = [text1, text2] * (N // 2)
t0 = time.perf_counter()
for d in docs:
    ref.parse_file(d)
ref_wall = time.perf_counter() - t0
print(f"reference (bs4 shimmed): {N} docs in {ref_wall:.2f}s = {N/ref_wall:.0f} docs/s single-thread")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from auraverse_etl_pipeline_spark.session import get_spark
from auraverse_etl_pipeline_spark.ingest.pipeline import detect_fragments, extract_records
spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string").cache()
df.count()
detect_fragments(df.limit(4)).count()  # warm JVM + ship package
t0 = time.perf_counter()
n_frag = detect_fragments(df).count()
frag_wall = time.perf_counter() - t0
t0 = time.perf_counter()
n_rec = extract_records(df).count()
rec_wall = time.perf_counter() - t0
print(f"spark local[32] detect: {N} docs in {frag_wall:.2f}s = {N/frag_wall:.0f} docs/s ({n_frag} fragments)")
print(f"spark local[32] detect+normalize: {N} docs in {rec_wall:.2f}s = {N/rec_wall:.0f} docs/s ({n_rec} records)")
print(f"speedup vs reference: detect {ref_wall/frag_wall:.1f}x, detect+normalize {ref_wall/rec_wall:.1f}x")
