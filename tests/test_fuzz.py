"""Property-based fuzz suite (SURVEY.md §5 rebuild test plan, item 4):
randomized documents built from shuffled format blocks must NEVER crash
the detector/normalizer/converter, and every output must satisfy the
span/priority invariants of the reference's ``_dedupe_prioritize``
(etl_parser.py:884-924). Pure-Python (no Spark session) so hypothesis
can run hundreds of examples quickly — the Spark layer is a map over
exactly these functions."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from auraverse_etl_pipeline_spark.ingest.convert import convert_document
from auraverse_etl_pipeline_spark.ingest.detect import PRIORITY, _RANK, detect_document
from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment

# Blocks of every format family the reference's fixtures exercise.
_BLOCKS = [
    '{"name": "Widget", "price": 9.99, "tags": ["a", "b"]}',
    '{broken: "json", trailing: 1,}',
    "name, qty, price\nbolt, 4, 0.25\nnut, 9, 0.10",
    "2024-01-01,5,alpha\n2024-01-02,7,beta",
    "host: example.com\nport: 8080\nretries = 3",
    "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>",
    "---\ntitle: Doc\ndraft: true\n---",
    "SELECT id, name FROM users WHERE active = 1;",
    "var config = { debug: true, level: 2 };",
    '<script type="application/ld+json">{"@type": "Product", "sku": "X1"}</script>',
    "Call (555) 123-4567 or email a@b.com for $10.00 off.",
    "plain prose with no structure at all, just words and words.",
    "",
    "   \n\n   ",
    "{" * 50,  # adversarial: unbalanced braces
    '{"nested": {"deep": {"deeper": [1, 2, {"x": null}]}}}',
]

_docs = st.lists(
    st.sampled_from(_BLOCKS), min_size=0, max_size=8
).flatmap(
    lambda blocks: st.sampled_from(["\n\n", "\n---\n", "\n--- SECTION\n"]).map(
        lambda sep: sep.join(blocks)
    )
)


@settings(max_examples=200, deadline=None)
@given(_docs)
def test_detector_never_crashes_and_invariants_hold(doc):
    frags = detect_document(doc)
    n = len(doc)
    prev_start = -1
    for f in frags:
        # spans are in-bounds, non-empty, and text matches the span
        assert 0 <= f.start < f.end <= n
        assert f.text == doc[f.start : f.end]
        assert 0.0 <= f.confidence <= 1.0
        # output ordered by start (reference O1)
        assert f.start >= prev_start
        prev_start = f.start
    # D13 invariant: no fragment fully contained in another kept
    # fragment of higher-or-equal priority
    for i, a in enumerate(frags):
        for b in frags[i + 1 :]:
            if a.start <= b.start and b.end <= a.end and a is not b:
                ra = _RANK.get(a.format_type, len(PRIORITY))
                rb = _RANK.get(b.format_type, len(PRIORITY))
                assert rb < ra, (a.format_type, b.format_type)


@settings(max_examples=200, deadline=None)
@given(_docs)
def test_normalizer_never_crashes_and_is_json_safe(doc):
    for f in detect_document(doc):
        data = normalize_fragment(f.format_type, f.text, f.meta)
        if data is not None:
            json.dumps(data)  # every record must be JSON-serializable


@settings(max_examples=100, deadline=None)
@given(_docs)
def test_converter_never_crashes(doc):
    out = convert_document(doc)
    assert isinstance(out, dict)
    json.dumps(out)


def test_adversarial_inputs_stay_bounded():
    """The reference's scan caps (200k brace window, 200-line CSV, 2k
    YAML tails) are semantics AND a runtime bound: pathological inputs
    must finish in seconds, not O(n²)."""
    import time

    adversarial = [
        "{" * 500_000,                       # half-MB of open braces
        '{"a":' * 100_000,                   # deep nesting prefix
        ("x," * 300 + "\n") * 5_000,         # 5k-line pseudo-CSV
        "key: value\n" * 200_000,            # 200k-line KV run
        "---\n" * 100_000,                   # divider storm
        "a" * 1_000_000,                     # 1 MB single token
    ]
    for doc in adversarial:
        t0 = time.perf_counter()
        frags = detect_document(doc)
        elapsed = time.perf_counter() - t0
        assert elapsed < 10.0, f"detector took {elapsed:.1f}s on {doc[:30]!r}..."
        for f in frags:
            assert 0 <= f.start < f.end <= len(doc)


def test_changeset_apply_matches_model(spark):
    """Property: apply_changeset == a dict-based reference model, for
    randomized I/U/D change logs (including conflicting ops per key)."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.changeset import apply_changeset

    change = st.tuples(
        st.integers(min_value=0, max_value=6),          # key
        st.sampled_from(["I", "U", "D"]),               # op
        st.integers(min_value=1, max_value=9),          # seq
        st.text(alphabet="abc", min_size=1, max_size=3) # value
    )

    @settings(max_examples=12, deadline=None)
    @given(changes=st.lists(change, min_size=0, max_size=12))
    def prop(changes):
        # unique (key, seq) pairs: the operator's latest-wins contract
        # is defined over a monotone sequence per key
        seen = set()
        uniq = []
        for k, op, seq, v in changes:
            if (k, seq) not in seen:
                seen.add((k, seq))
                uniq.append((k, op, seq, v))
        snap_rows = [(k, f"base{k}") for k in range(4)]
        model = dict(snap_rows)
        latest = {}
        for k, op, seq, v in uniq:
            if k not in latest or seq > latest[k][1]:
                latest[k] = (op, seq, v)
        for k, (op, seq, v) in latest.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        snap = spark.createDataFrame(snap_rows, "k long, v string")
        if uniq:
            chg = spark.createDataFrame(
                [(k, v, op, seq) for k, op, seq, v in uniq],
                "k long, v string, op string, seq int",
            )
        else:
            chg = spark.createDataFrame([], "k long, v string, op string, seq int")
        got = {(r.k, r.v) for r in apply_changeset(snap, chg, key_col="k").collect()}
        assert got == set(model.items()), (uniq, got, model)

    prop()


def test_decontaminate_matches_model(spark):
    """Property: decontaminate == a Python set-model of shared word
    n-grams, over randomized small corpora."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.dedup import decontaminate

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    def shingles(text, n):
        toks = [t for t in text.strip().split() if t] if text.strip() else []
        if text.strip() == "":
            toks = [""]  # split('') semantics of the Spark tokenizer
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    @settings(max_examples=10, deadline=None)
    @given(train=st.lists(doc, min_size=1, max_size=6), ev=st.lists(doc, min_size=1, max_size=3))
    def prop(train, ev):
        n = 3
        ev_sh = set().union(*(shingles(t, n) for t in ev)) if ev else set()
        expect = {
            i for i, t in enumerate(train) if not (shingles(t, n) & ev_sh)
        }
        tdf = spark.createDataFrame(list(enumerate(train)), "doc_id long, text string")
        edf = spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(ev)], "doc_id long, text string"
        )
        got = {r.doc_id for r in decontaminate(tdf, edf, n=n).collect()}
        assert got == expect, (train, ev, got, expect)

    prop()


def test_scd2_history_matches_model(spark):
    """Property: scd2_history == the per-key sorted-changes model."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.changeset import scd2_history

    change = st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=1, max_value=8),
    )

    @settings(max_examples=10, deadline=None)
    @given(changes=st.lists(change, min_size=1, max_size=10))
    def prop(changes):
        seen = set()
        uniq = [c for c in changes if not (c[:1] + c[2:] in seen or seen.add(c[:1] + c[2:]))]
        expect = set()
        by_key = {}
        for k, op, seq in uniq:
            by_key.setdefault(k, []).append((seq, op))
        for k, evs in by_key.items():
            evs.sort()
            for (seq, op), nxt in zip(evs, [e[0] for e in evs[1:]] + [None]):
                if op != "D":
                    expect.add((k, seq, nxt))
        chg = spark.createDataFrame(
            [(k, op, seq) for k, op, seq in uniq], "k long, op string, seq int"
        )
        got = {(r.k, r.valid_from, r.valid_to) for r in scd2_history(chg, key_col="k").collect()}
        assert got == expect, (uniq, got, expect)

    prop()


def test_bloom_matches_model(spark):
    """Property: for randomized key sets, every inserted key probes
    True (no false negatives — Bloom's defining guarantee), and the
    filter never exceeds its word budget. Runs one geometry per
    example to cover parameter derivation too."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_parameters,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        keys=st.lists(st.text(alphabet="abcxyz:0123", min_size=0, max_size=8),
                      min_size=1, max_size=20),
        fpp=st.sampled_from([0.3, 0.05, 0.01]),
    )
    def prop(keys, fpp):
        num_bits, num_hashes = bloom_parameters(len(set(keys)), fpp)
        kdf = spark.createDataFrame([(k,) for k in keys], "k string")
        bloom = bloom_build(kdf, "k", num_bits, num_hashes)
        assert bloom.count() <= num_bits // 63
        probed = bloom_might_contain(kdf, bloom, "k", num_bits, num_hashes)
        assert probed.filter("NOT bloom_hit").count() == 0

    prop()


def test_cms_matches_model(spark):
    """Property: for randomized key multisets, every estimate is >=
    the true multiplicity (one-sided guarantee) at ANY width, and at
    generous width the estimates are exact."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.sketches import cms_build, cms_lookup

    @settings(max_examples=8, deadline=None)
    @given(
        keys=st.lists(st.sampled_from(["a", "b", "c", "dd", "ee", "#", ""]),
                      min_size=1, max_size=30),
        width=st.sampled_from([2, 8, 512]),
    )
    def prop(keys, width):
        true = Counter(keys)
        inst = spark.createDataFrame([(k,) for k in keys], "k string")
        cms = cms_build(inst, "k", depth=3, width=width)
        uniq = spark.createDataFrame([(k,) for k in true], "k string")
        got = {r.k: r.est_count for r in cms_lookup(uniq, cms, "k", depth=3, width=width).collect()}
        for k, n in true.items():
            assert got[k] >= n, (k, got[k], n, width)
        if width == 512:  # effectively collision-free at this size
            assert all(got[k] == n for k, n in true.items())

    prop()


def test_bpe_train_matches_model(spark):
    """Property: the window-algebra BPE trainer == a pure-Python
    reference (greedy left-to-right merges, (count desc, lhs, rhs)
    tie-break), for randomized small corpora including pathological
    repeated-character words where overlap handling matters."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.bpe import bpe_train

    word = st.text(alphabet="abé\U0001d11e", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    def ref(texts, num_merges):
        wf = Counter(w for t in texts for w in t.strip().split() if w)
        vocab = {w: list(w) for w in wf}
        merges = []
        for step in range(num_merges):
            pc = Counter()
            for w, syms in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += wf[w]
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < 2:
                break
            merges.append((step, l, r, c))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        return merges

    @settings(max_examples=6, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=3))
    def prop(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got = [
            (r.step, r.lhs, r.rhs, r.pair_count)
            for r in bpe_train(docs, num_merges=3).orderBy("step").collect()
        ]
        assert got == ref(texts, 3)

    prop()


def test_bm25_matches_model(spark):
    """Property: bm25_search == a pure-Python BM25 scorer (same idf
    form, same constants) on randomized tiny corpora/queries — scores
    compared to 1e-9 relative (Python sums in float order; the
    operator sums DECIMAL partials)."""
    import math

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_index,
        bm25_search,
    )

    word = st.sampled_from(["fox", "dog", "cat", "run", "sleep"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    def ref(texts, query, k1=BM25_K1, b=BM25_B):
        toks = [t.split() for t in texts]
        n = len(toks)
        avgdl = sum(len(t) for t in toks) / n
        dfs: dict = {}
        for t in toks:
            for w in set(t):
                dfs[w] = dfs.get(w, 0) + 1
        out = {}
        for i, t in enumerate(toks):
            s = 0.0
            for w in set(query.split()):
                if w not in dfs or w not in t:
                    continue
                tf = t.count(w)
                idf = math.log(1.0 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(t) / avgdl)
                )
            if s > 0:
                out[i] = s
        return out

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(doc, min_size=1, max_size=5),
        query=st.lists(word, min_size=1, max_size=3).map(" ".join),
    )
    def prop(texts, query):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        idx = bm25_index(docs)
        queries = spark.createDataFrame([(0, query)], "query_id bigint, text string")
        got = {r.doc_id: r.score for r in bm25_search(queries, idx, k=100).collect()}
        expected = ref(texts, query)
        assert set(got) == set(expected)
        for d, s in expected.items():
            assert abs(got[d] - s) <= 1e-9 * max(1.0, abs(s))

    prop()


def test_pmi_phrases_matches_model(spark):
    """Property: pmi_phrases == a Counter-based reference model
    (pair/unigram counts, discounted-PMI score) on randomized tiny
    corpora."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.quality import pmi_phrases

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    def ref(texts, min_count, delta):
        uni: Counter = Counter()
        pairs: Counter = Counter()
        for t in texts:
            toks = t.split()
            uni.update(toks)
            pairs.update(zip(toks, toks[1:]))
        n = sum(uni.values())
        return {
            (w1, w2): (
                c,
                uni[w1],
                uni[w2],
                float(c - delta) * float(n) / (float(uni[w1]) * float(uni[w2])),
            )
            for (w1, w2), c in pairs.items()
            if c >= min_count
        }

    @settings(max_examples=6, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=4))
    def prop(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        out = pmi_phrases(docs, min_count=2, delta=1)
        got = {
            (r.w1, r.w2): (r.pair_count, r.w1_count, r.w2_count, r.score)
            for r in out.collect()
        }
        out.release_caches()
        assert got == ref(texts, 2, 1)

    prop()


def test_prefix_filter_recall_matches_exhaustive(spark):
    """Property: prefix_filter_jaccard_pairs finds EXACTLY the pairs
    the exhaustive sparse join finds, on randomized corpora that
    include planted near-duplicates — the AllPairs recall guarantee,
    fuzzed."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    word = st.sampled_from(["red", "blue", "green", "fox", "dog"])
    doc = st.lists(word, min_size=3, max_size=10).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(doc, min_size=2, max_size=6),
        tau=st.sampled_from([0.3, 0.5, 0.8]),
    )
    def prop(texts, tau):
        # plant a near-dup of doc 0 so the qualifying set is non-trivial
        texts = list(texts) + [texts[0] + " extra"]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got = prefix_filter_jaccard_pairs(docs, threshold=tau, n=2)
        g = {(r.id1, r.id2): round(r.jaccard, 12) for r in got.collect()}
        got.release_caches()
        t = {
            (r.id1, r.id2): round(r.jaccard, 12)
            for r in ngram_jaccard_pairs(docs, threshold=tau, n=2).collect()
        }
        assert g == t

    prop()


def test_signlsh_short_vector_audit_matches_drop(spark):
    """Property: on mixed-width corpora, short_vectors() returns
    EXACTLY the ids signbucket_lsh_pairs can never emit (width <
    band_bits), wide near-duplicate pairs are still found, and the
    audit is empty when every vector clears the geometry."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        short_vectors,
        signbucket_lsh_pairs,
    )

    BAND_BITS = 8
    comp = st.floats(min_value=-1, max_value=1, allow_nan=False, width=32)
    # wide vectors draw nonzero components: a zero-norm vector has no
    # cosine to anything (ANSI divide-by-zero) and belongs upstream of
    # any cosine tier, not in this property
    nz = st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0])
    short_vec = st.lists(comp, min_size=2, max_size=BAND_BITS - 1)
    wide_vec = st.lists(nz, min_size=BAND_BITS, max_size=12)

    @settings(max_examples=5, deadline=None)
    @given(
        shorts=st.lists(short_vec, min_size=0, max_size=3),
        wides=st.lists(wide_vec, min_size=1, max_size=3),
    )
    def prop(shorts, wides):
        # plant an exact duplicate of the first wide vector so the
        # qualifying pair set is non-trivial
        vecs = list(wides) + [wides[0]] + list(shorts)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        short_ids = {r.id for r in short_vectors(emb, BAND_BITS).collect()}
        assert short_ids == {i for i, v in enumerate(vecs) if len(v) < BAND_BITS}
        got = signbucket_lsh_pairs(emb, threshold=0.99, band_bits=BAND_BITS)
        pairs = {(r.id1, r.id2) for r in got.collect()}
        got.release_caches()
        # no dropped id ever appears in the output...
        assert all(a not in short_ids and b not in short_ids for a, b in pairs)
        # ...and the planted wide duplicate is still found
        assert (0, len(wides)) in pairs

    prop()


def test_bigram_lm_matches_model(spark):
    """Property: in-engine bigram-LM training + scoring equals a pure
    Python Counter model (add-1 smoothing, observed-bigram /
    context-miss / double-unseen fallbacks) on randomized corpora."""
    import math
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.lm import lm_score_report

    word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=6))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        ref_rows = [(i, t) for i, t in rows if i % 2 == 0]
        ref = docs.filter("doc_id % 2 = 0")

        # pure-Python model; NB split semantics must mirror the engine:
        # split(trim(''), '\\s+') yields [''] (one empty token), not []
        import re

        def toks(t):
            return re.split(r"\s+", t.strip())

        big, ctx, vocab = Counter(), Counter(), set()
        for _, t in ref_rows:
            ws = toks(t)
            vocab.update(ws)
            for p, w in zip(ws, ws[1:]):
                big[(p, w)] += 1
                ctx[p] += 1
        V = len(vocab)

        def logp(p, w):
            if (p, w) in big:
                return math.log((big[(p, w)] + 1.0) / (ctx[p] + 1.0 * V))
            if p in ctx:
                return math.log(1.0 / (ctx[p] + 1.0 * V))
            return math.log(1.0 / (0 + 1.0 * V))

        want = {}
        for i, t in rows:
            ws = toks(t)
            trs = list(zip(ws, ws[1:]))
            if trs:
                want[i] = (len(trs), -sum(logp(p, w) for p, w in trs) / len(trs))
            else:
                want[i] = (0, None)

        out = lm_score_report(docs, ref)
        got = {
            r.id: (r.n_transitions, r.xent) for r in out.collect()
        }
        out.release_caches()
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], (i, got[i], want[i])
            if want[i][1] is None:
                assert got[i][1] is None
            else:
                assert got[i][1] is not None
                assert abs(got[i][1] - want[i][1]) < 1e-9, (i, got[i], want[i])

    prop()


def test_trigram_lm_matches_model(spark):
    """Property: the order=3 trigram head + KenLM-shaped backoff chain
    (logp3 → logp_miss3 → logp → logp_miss → logp_unseen) equals a
    pure-Python Counter model on randomized corpora — including the
    p2-is-null backoff boundary at every document's second token."""
    import math
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.lm import lm_score_report

    word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=6))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        ref_rows = [(i, t) for i, t in rows if i % 2 == 0]
        ref = docs.filter("doc_id % 2 = 0")

        import re

        def toks(t):
            return re.split(r"\s+", t.strip())

        big, ctx, tri, ctx3, vocab = Counter(), Counter(), Counter(), Counter(), set()
        for _, t in ref_rows:
            ws = toks(t)
            vocab.update(ws)
            for p, w in zip(ws, ws[1:]):
                big[(p, w)] += 1
                ctx[p] += 1
            for p2, p, w in zip(ws, ws[1:], ws[2:]):
                tri[(p2, p, w)] += 1
                ctx3[(p2, p)] += 1
        V = len(vocab)

        def logp(p2, p, w):
            if p2 is not None:
                if (p2, p, w) in tri:
                    return math.log((tri[(p2, p, w)] + 1.0) / (ctx3[(p2, p)] + V))
                if (p2, p) in ctx3:
                    return math.log(1.0 / (ctx3[(p2, p)] + V))
            if (p, w) in big:
                return math.log((big[(p, w)] + 1.0) / (ctx[p] + 1.0 * V))
            if p in ctx:
                return math.log(1.0 / (ctx[p] + 1.0 * V))
            return math.log(1.0 / (0 + 1.0 * V))

        want = {}
        for i, t in rows:
            ws = toks(t)
            trs = list(zip([None] + ws[:-2], ws, ws[1:]))
            if trs:
                want[i] = (
                    len(trs),
                    -sum(logp(p2, p, w) for p2, p, w in trs) / len(trs),
                )
            else:
                want[i] = (0, None)

        out = lm_score_report(docs, ref, order=3)
        got = {r.id: (r.n_transitions, r.xent) for r in out.collect()}
        out.release_caches()
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], (i, got[i], want[i])
            if want[i][1] is None:
                assert got[i][1] is None
            else:
                assert got[i][1] is not None
                assert abs(got[i][1] - want[i][1]) < 1e-9, (i, got[i], want[i])

    prop()


def test_logreg_matches_pure_python_gd(spark):
    """Property: in-engine logistic-regression training + scoring
    equals a pure-Python replica of the exact arithmetic — md5 bucket
    hash, binary presence + bias features, LOGREG_FIXED_POINT-partial
    dot products and gradients (each term floor(v*2^40) summed as an
    exact integer, one division at the end — no decimal rounding mode
    ever exercised), libm sigmoid, plain float weight updates — on
    randomized corpora and labels."""
    import hashlib
    import math
    import re
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.classifier import (
        LOGREG_FIXED_POINT,
        logreg_score,
        logreg_train,
    )

    B, LR, ITERS = 64, 1.0, 2
    FX = LOGREG_FIXED_POINT

    def fxq(v: float) -> int:
        return math.floor(v * FX)

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=4, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=6), data=st.data())
    def prop(texts, data):
        labels = [
            data.draw(st.sampled_from(["en", "de"])) for _ in texts
        ]
        rows = [(i, t, l) for i, (t, l) in enumerate(zip(texts, labels))]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

        # pure-Python replica
        feats = {}
        for i, t, _ in rows:
            toks = re.split(r"\s+", t.strip())
            f = {bucket(w): 1.0 for w in toks}
            f[-1] = 1.0
            feats[i] = f
        ys = {i: 1.0 if l == "en" else 0.0 for i, _, l in rows}
        n = len(rows)
        decay = data.draw(st.booleans())
        w = {}
        for t in range(1, ITERS + 1):
            step_lr = LR / t if decay else LR
            s = {
                i: float(sum(fxq(x * w.get(b, 0.0)) for b, x in f.items())) / FX
                for i, f in feats.items()
            }
            p = {i: 1.0 / (1.0 + math.exp(-v)) for i, v in s.items()}
            g = Counter()
            for i, f in feats.items():
                for b, x in f.items():
                    g[b] += fxq((p[i] - ys[i]) * x)
            for b, gd in g.items():
                w[b] = w.get(b, 0.0) - step_lr * ((float(gd) / FX) / n)

        model = logreg_train(
            df, "lang", "en", num_buckets=B, lr=LR, iters=ITERS, decay=decay
        )
        got_w = {int(r.bucket): r.w for r in model.collect()}
        assert set(got_w) == set(w)
        for b in w:
            assert abs(got_w[b] - w[b]) < 1e-9, (b, got_w[b], w[b])

        scored = {
            r.id: (r.score, r.prob, r.predicted)
            for r in logreg_score(df, model, num_buckets=B).collect()
        }
        for i, f in feats.items():
            want_s = float(sum(fxq(x * w.get(b, 0.0)) for b, x in f.items())) / FX
            ws, wp, wpred = scored[i]
            assert abs(ws - want_s) < 1e-9, (i, ws, want_s)
            assert abs(wp - 1.0 / (1.0 + math.exp(-want_s))) < 1e-9
            assert wpred == (want_s > 0)

    prop()


def test_trigram_head_sharpens_reference_fit(spark, sf_dir):
    """The trigram head's reason to exist: on reference-like text the
    backoff model must fit measurably better (lower cross-entropy)
    than the bigram base — more context sharpens predictions on seen
    n-grams faster than add-1 smoothing dilutes them (measured 3.33 →
    2.86 nats/token on the fixture's trusted slice)."""
    import pyspark.sql.functions as F

    from auraverse_etl_pipeline_spark.operators.lm import lm_score_report
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    means = {}
    for order in (2, 3):
        out = lm_score_report(ref, ref, order=order)
        means[order] = out.agg(F.avg("xent")).first()[0]
        out.release_caches()
    assert means[3] < means[2] - 0.1, means


def test_lloyd_ivf_matches_pure_python(spark):
    """Property: the in-engine Lloyd quantizer equals a pure-Python
    replica of the exact arithmetic — sample init, clamped sequential-
    fold cosine argmax (ties to the lowest cell), fixed-point means
    (floor(x·2^43) summed exactly, one division), empty-cell carry —
    on randomized float32-quantized corpora."""
    import math

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        _LLOYD_FIXED_POINT,
        ivf_index,
    )

    # float32-like components: dyadic rationals on a 2^-10 grid keep
    # every value exact in double AND exact at the 2^43 fixed point
    comp = st.integers(min_value=-1024, max_value=1024).map(lambda v: v / 1024.0)
    vec = st.lists(comp, min_size=4, max_size=4)

    @settings(max_examples=5, deadline=None)
    @given(vecs=st.lists(vec, min_size=4, max_size=10), k=st.sampled_from([2, 3]))
    def prop(vecs, k):
        from hypothesis import assume

        # degenerate all-zero vectors make cosine undefined; skip
        assume(all(any(x != 0.0 for x in v) for v in vecs))
        rows = list(enumerate(vecs))
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

        def cos(a, b):
            dot = 0.0
            for x, y in zip(a, b):
                dot = dot + x * y
            na = 0.0
            for x in a:
                na = na + x * x
            nb = 0.0
            for y in b:
                nb = nb + y * y
            return min(1.0, dot / (math.sqrt(na) * math.sqrt(nb)))

        cents = {c: list(vecs[c]) for c in range(k)}  # sample init: lowest ids
        for _ in range(2):
            asg = {}
            for i, v in rows:
                best = max(range(k), key=lambda c: (cos(v, cents[c]), -c))
                asg[i] = best
            new = {}
            for c in range(k):
                members = [vecs[i] for i in asg if asg[i] == c]
                if not members:
                    new[c] = cents[c]
                    continue
                n = len(members)
                new[c] = [
                    float(
                        sum(
                            int(math.floor(m[d] * _LLOYD_FIXED_POINT))
                            for m in members
                        )
                    )
                    / n
                    / _LLOYD_FIXED_POINT
                    for d in range(4)
                ]
            cents = new

        idx = ivf_index(df, nlist=k, quantizer="lloyd", max_iter=2)
        got_c = {r.cell: list(r.centroid) for r in idx.centroids.collect()}
        assert set(got_c) == set(cents)
        for c in cents:
            assert got_c[c] == cents[c], (c, got_c[c], cents[c])
        got_a = {r.id: r.cell for r in idx.assignments.collect()}
        want_a = {
            i: max(range(k), key=lambda c: (cos(v, cents[c]), -c)) for i, v in rows
        }
        assert got_a == want_a

    prop()


def test_lloyd_pq_matches_pure_python(spark):
    """Property: Lloyd-trained PQ codebooks equal a pure-Python replica
    — per-subspace sample init, sequential-fold L2 argmin (ties to the
    lowest code), fixed-point means, empty-code carry."""
    import math

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        _LLOYD_FIXED_POINT,
        pq_codebooks,
    )

    comp = st.integers(min_value=-1024, max_value=1024).map(lambda v: v / 1024.0)
    vec = st.lists(comp, min_size=4, max_size=4)  # m=2 subspaces of 2

    @settings(max_examples=5, deadline=None)
    @given(vecs=st.lists(vec, min_size=4, max_size=10), ksub=st.sampled_from([2, 3]))
    def prop(vecs, ksub):
        rows = list(enumerate(vecs))
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        m, dsub = 2, 2

        def l2(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + (x - y) * (x - y)
            return acc

        subv = {(i, s): v[s * dsub : (s + 1) * dsub] for i, v in rows for s in range(m)}
        cb = {
            (s, c): list(subv[(c, s)]) for s in range(m) for c in range(ksub)
        }  # lowest-id init per subspace
        for _ in range(2):
            asg = {
                (i, s): min(range(ksub), key=lambda c: (l2(subv[(i, s)], cb[(s, c)]), c))
                for i, _ in rows
                for s in range(m)
            }
            new = {}
            for s in range(m):
                for c in range(ksub):
                    members = [subv[(i, s)] for (i, s2), c2 in asg.items() if s2 == s and c2 == c]
                    if not members:
                        new[(s, c)] = cb[(s, c)]
                        continue
                    n = len(members)
                    new[(s, c)] = [
                        float(
                            sum(
                                int(math.floor(mm[d] * _LLOYD_FIXED_POINT))
                                for mm in members
                            )
                        )
                        / n
                        / _LLOYD_FIXED_POINT
                        for d in range(dsub)
                    ]
            cb = new

        got = {
            (r.sub, r.code): list(r.centroid)
            for r in pq_codebooks(
                df, m=m, ksub=ksub, dim=4, quantizer="lloyd", max_iter=2
            ).collect()
        }
        assert set(got) == set(cb)
        for key in cb:
            assert got[key] == cb[key], (key, got[key], cb[key])

    prop()


def test_containment_recall_matches_exhaustive(spark):
    """Property: containment_pairs finds EXACTLY the directed pairs a
    pure-Python exhaustive shingle-set model finds — the one-sided
    prefix-filter recall guarantee, fuzzed with planted subsets."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.dedup import containment_pairs

    word = st.sampled_from(["red", "blue", "green", "fox", "dog", "run"])
    doc = st.lists(word, min_size=3, max_size=10).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(doc, min_size=2, max_size=6),
        tau=st.sampled_from([0.5, 0.8, 1.0]),
    )
    def prop(texts, tau):
        # plant a true subset: the first half of doc 0's tokens
        toks0 = texts[0].split()
        texts = list(texts) + [" ".join(toks0[: max(len(toks0) // 2, 1)])]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got = containment_pairs(docs, threshold=tau, n=2)
        g = {
            (r.contained_id, r.container_id): round(r.containment, 12)
            for r in got.collect()
        }
        got.release_caches()

        def sh(t):
            ws = t.strip().split()
            return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

        want = {}
        sets = {i: sh(t) for i, t in enumerate(texts)}
        for a, sa in sets.items():
            if not sa:
                continue
            for b, sb in sets.items():
                if a == b or not sb:
                    continue
                c = len(sa & sb) / len(sa)
                if c >= tau:
                    want[(a, b)] = round(c, 12)
        assert g == want

    prop()


def test_warc_roundtrip_arbitrary_payloads(spark):
    """Property: WARC build→parse round-trips ANY payload bytes —
    including payloads containing CRLF, blank lines, fake 'WARC/1.0'
    version lines, and gzip magic — because framing is Content-Length
    slicing, never delimiter search. The classic WARC parser bug is
    scanning for the record separator inside the payload."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.ingest.warc import build_warc, parse_warc

    nasty = st.sampled_from(
        [b"\r\n\r\n", b"WARC/1.0\r\n", b"\x1f\x8b", b"Content-Length: 0\r\n"]
    )
    payload = st.lists(
        st.one_of(st.binary(max_size=20), nasty), max_size=6
    ).map(b"".join)

    @settings(max_examples=25, deadline=None)
    @given(payloads=st.lists(payload, min_size=1, max_size=4), gz=st.booleans())
    def prop(payloads, gz):
        records = [(f"http://x/{i}", p) for i, p in enumerate(payloads)]
        parsed = parse_warc(build_warc(records, gzip=gz))
        assert [r["payload"] for r in parsed] == payloads
        assert [r["headers"]["WARC-Target-URI"] for r in parsed] == [
            u for u, _ in records
        ]

    prop()


def test_dsir_matches_model(spark):
    """Property: dsir_importance equals a pure-Python add-1 bucket
    model (same md5 bucketing, same smoothing) on randomized corpora
    and target slices."""
    import hashlib
    import math
    import re
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.sampling import dsir_importance

    B = 256
    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    @settings(max_examples=5, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=6))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        target = docs.filter("doc_id % 2 = 0")

        rc, tc = Counter(), Counter()
        for i, t in rows:
            for w in re.split(r"\s+", t.strip()):
                rc[bucket(w)] += 1
                if i % 2 == 0:
                    tc[bucket(w)] += 1
        rt, tt = sum(rc.values()), sum(tc.values())
        lam = {
            b: math.log((tc.get(b, 0) + 1.0) / (tt + 1.0 * B))
            - math.log((rc[b] + 1.0) / (rt + 1.0 * B))
            for b in rc
        }
        want = {}
        for i, t in rows:
            toks = re.split(r"\s+", t.strip())
            want[i] = (len(toks), sum(lam[bucket(w)] for w in toks))

        out = dsir_importance(docs, target, num_buckets=B)
        got = {r.id: (r.n_tokens, r.log_weight) for r in out.collect()}
        out.release_caches()
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert abs(got[i][1] - want[i][1]) < 1e-9, (i, got[i], want[i])

    prop()


def test_hashed_embeddings_match_model(spark):
    """Property: the hashing-trick embedding equals a pure-Python
    model (md5 buckets, sign bit from the 16th hex char, L2
    normalization), including all-cancelled zero vectors surviving as
    zeros."""
    import hashlib
    import math
    import re

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import hashed_embeddings

    DIM = 16
    word = st.sampled_from(["x", "yy", "zzz", "w4", "v55"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=5))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = hashed_embeddings(docs, dim=DIM)
        got = {r.id: (list(r.embedding), r.norm) for r in out.collect()}

        for i, t in rows:
            raw = [0.0] * DIM
            for w in re.split(r"\s+", t.strip()):
                h = hashlib.md5(w.encode()).hexdigest()
                b = int(h[:15], 16) % DIM
                raw[b] += 1.0 if int(h[15], 16) % 2 == 0 else -1.0
            norm = math.sqrt(sum(x * x for x in raw))
            vec = [x / norm for x in raw] if norm > 0 else raw
            g_vec, g_norm = got[i]
            assert abs(g_norm - norm) < 1e-12
            assert all(abs(a - b) < 1e-12 for a, b in zip(g_vec, vec)), i

    prop()


def test_codec_parsers_fail_closed_on_corruption(spark):
    """Property: truncating or byte-flipping a valid JPEG or WARC
    payload either still decodes (flips in payload/raster bytes can be
    benign) or raises ValueError — never a crash, hang, or silent
    wrong-type return. The fail-closed contract every strict parser in
    this repo claims."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.ingest.warc import build_warc, parse_warc
    from auraverse_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    from auraverse_etl_pipeline_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_wav,
        encode_bmp,
        encode_png,
        encode_wav,
    )

    rng = np.random.RandomState(5)
    jpeg = encode_jpeg(rng.randint(0, 256, (16, 16), dtype=np.uint8))
    warc = build_warc([("http://x/1", b"hello"), ("http://x/2", b"wor\xffld")])
    rgb = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    png = encode_png(rgb, row_filters=[0, 1, 2, 3, 4, 0, 1, 2, 3])
    bmp = encode_bmp(rgb)
    wav = encode_wav(rng.randint(-3000, 3000, 64).astype(np.int16))

    targets = (
        (jpeg, decode_jpeg),
        (warc, parse_warc),
        (png, decode_png),
        (bmp, decode_bmp),
        (wav, decode_wav),
    )

    @settings(max_examples=40, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=200), flip=st.integers(0, 10_000))
    def prop(cut, flip):
        for payload, parse in targets:
            trunc = payload[: max(len(payload) - cut, 0)]
            try:
                parse(trunc)
            except ValueError:
                pass
            mut = bytearray(payload)
            mut[flip % len(mut)] ^= 0xFF
            try:
                parse(bytes(mut))
            except ValueError:
                pass

    prop()


def test_unigram_matches_pure_python_em(spark):
    """Property: in-engine unigram-LM training + encoding equals a
    pure-Python replica of the exact arithmetic — seed substring
    counts with min-count/char-keep, enumerated-composition Viterbi
    with (score DESC, comp DESC) ties and left-fold scores, add-one
    character floor recounts, char-preserving prune, libm ln, and the
    fixed-point encode digest — on randomized corpora."""
    import hashlib
    import math
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.unigram import (
        UNIGRAM_FIXED_POINT,
        compositions,
        unigram_encode,
        unigram_train,
    )

    W, L, V, EM, MIN = 6, 3, 12, 2, 2
    COMPS = {}
    for wlen, comp, k, s, l in compositions(W, L):
        COMPS.setdefault(wlen, {}).setdefault(comp, []).append((k, s, l))

    def train_replica(texts):
        wf = Counter()
        for t in texts:
            for w in t.split():
                if w and len(w) <= W:
                    wf[w] += 1
        words = {w: (f, len(w)) for w, (f, wl) in (
            (w, (f, len(w))) for w, f in wf.items()
        )}
        # seed
        sc = Counter()
        for w, f in wf.items():
            n = len(w)
            for s in range(1, n + 1):
                for l in range(1, L + 1):
                    if s + l - 1 <= n:
                        sc[w[s - 1 : s - 1 + l]] += f
        chars = {c for w in wf for c in w}
        cnt = {p: c for p, c in sc.items() if len(p) == 1 or c >= MIN}

        def with_logp(cnt):
            tot = sum(cnt.values())
            return {p: (c, math.log(float(c)) - math.log(float(tot)))
                    for p, c in cnt.items()}

        def viterbi(model):
            out = {}
            for w, f in wf.items():
                best = None
                for comp, parts in COMPS.get(len(w), {}).items():
                    pieces = [w[s - 1 : s - 1 + l] for _, s, l in sorted(parts)]
                    if any(p not in model for p in pieces):
                        continue
                    sc_ = 0.0
                    for p in pieces:
                        sc_ = sc_ + model[p][1]
                    key = (sc_, comp)
                    if best is None or key > best[0]:
                        best = (key, pieces)
                if best is not None:
                    out[w] = (best[1], best[0][0])
            return out

        model = with_logp(cnt)
        for _ in range(EM):
            seg = viterbi(model)
            u = Counter()
            for w, (pieces, _) in seg.items():
                for p in pieces:
                    u[p] += wf[w]
            cnt = {p: c for p, c in u.items() if len(p) > 1}
            for c in chars:
                cnt[c] = u.get(c, 0) + 1
            model = with_logp(cnt)
        n_chars = sum(1 for p in model if len(p) == 1)
        multi = sorted(
            ((p, c) for p, (c, _) in model.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[: max(V - n_chars, 0)]
        kept = {p: c for p, (c, _) in model.items() if len(p) == 1}
        kept.update(dict(multi))
        return with_logp(kept), viterbi, wf

    word = st.sampled_from(["ab", "abab", "ba", "aabb", "abc", "cab", "c", "abcab", "é𝄞", "世界b"])
    doc = st.lists(word, min_size=1, max_size=10).map(" ".join)

    @settings(max_examples=3, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=5))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        model, viterbi, wf = train_replica(texts)

        got = unigram_train(
            df, vocab_size=V, em_iters=EM, max_piece_len=L,
            max_word_len=W, min_count=MIN,
        )
        got_m = {r.piece: (r.cnt, r.logp) for r in got.collect()}
        assert set(got_m) == set(model)
        for p, (c, lp) in model.items():
            assert got_m[p][0] == c, (p, got_m[p], c)
            assert got_m[p][1] == lp, (p, got_m[p], lp)

        seg = viterbi(model)
        enc = unigram_encode(df, got, max_piece_len=L, max_word_len=W)
        got_e = {r.id: (r.n_pieces, r.pieces_md5, r.logp_fx) for r in enc.collect()}
        enc.release_caches()
        for i, t in rows:
            toks = [w for w in t.split() if w and len(w) <= W]
            stream, n, fxsum = [], 0, 0
            for w in toks:
                pieces, sc_ = seg[w]
                stream.append(" ".join(pieces))
                n += len(pieces)
                fxsum += math.floor(sc_ * UNIGRAM_FIXED_POINT)
            want_md5 = hashlib.md5(" ".join(stream).encode()).hexdigest()
            assert got_e[i] == (n, want_md5, fxsum), (i, got_e[i], (n, want_md5, fxsum))

    prop()


def test_objectives_match_pure_python(spark):
    """Property: span_corruption and fim_transform equal a pure-Python
    replica of the md5-derived placement arithmetic and stream
    re-assembly, on randomized corpora."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.objectives import (
        fim_transform,
        span_corruption,
    )

    LEN, EVERY, FMIN = 2, 5, 4

    def h60(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    def replica_sc(i, toks):
        n = len(toks)
        inp, tgt, n_spans, n_masked = [], [], 0, 0
        for p0, tok in enumerate(toks):
            blk = p0 // EVERY
            ok = (blk + 1) * EVERY <= n
            off = h60(f"{i}:{blk}") % (EVERY - LEN + 1)
            rel = p0 - blk * EVERY
            in_span = ok and off <= rel < off + LEN
            first = ok and rel == off
            if first:
                inp.append(f"<extra_id_{blk}>")
                tgt.append((p0 + 1) * 2)
                n_spans += 1
            elif not in_span:
                inp.append(tok)
            if in_span:
                tgt.append((p0 + 1) * 2 + 1)
                n_masked += 1
        # rebuild target stream in opos order
    # (keep replica simple: rebuild in a second pass)
        tgt_pieces = []
        for p0, tok in enumerate(toks):
            blk = p0 // EVERY
            ok = (blk + 1) * EVERY <= n
            off = h60(f"{i}:{blk}") % (EVERY - LEN + 1)
            rel = p0 - blk * EVERY
            if ok and rel == off:
                tgt_pieces.append((((p0 + 1) * 2), f"<extra_id_{blk}>"))
            if ok and off <= rel < off + LEN:
                tgt_pieces.append((((p0 + 1) * 2 + 1), tok))
        tgt_pieces.sort()
        inputs_md5 = hashlib.md5(" ".join(inp).encode()).hexdigest()
        targets_md5 = (
            hashlib.md5(" ".join(p for _, p in tgt_pieces).encode()).hexdigest()
            if tgt_pieces else ""
        )
        return (n, n_spans, n_masked, inputs_md5, targets_md5)

    def replica_fim(i, toks):
        n = len(toks)
        if n >= FMIN:
            ra = 1 + h60(f"{i}:a") % (n - 2)
            rb = 1 + h60(f"{i}:b") % (n - 2)
            a, b = min(ra, rb), max(ra, rb) + (1 if ra == rb else 0)
        else:
            a = b = 0
        if b == 0:
            stream = ["<PRE>"] + toks
        else:
            stream = (
                ["<PRE>"] + toks[:a] + ["<SUF>"] + toks[b:] + ["<MID>"] + toks[a:b]
            )
        return (n, a, b, hashlib.md5(" ".join(stream).encode()).hexdigest())

    word = st.sampled_from(["aa", "b", "ccc", "dd", "éé", "𝄞a"])
    doc = st.lists(word, min_size=1, max_size=14).map(" ".join)

    @settings(max_examples=4, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=6))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got_sc = {
            r.id: (r.n_tokens, r.n_spans, r.n_masked, r.inputs_md5, r.targets_md5)
            for r in span_corruption(df, span_len=LEN, span_every=EVERY).collect()
        }
        got_fim = {
            r.id: (r.n_tokens, r.cut_a, r.cut_b, r.fim_md5)
            for r in fim_transform(df, min_tokens=FMIN).collect()
        }
        for i, t in rows:
            toks = t.split()
            assert got_sc[i] == replica_sc(i, toks), (i, got_sc[i], replica_sc(i, toks))
            assert got_fim[i] == replica_fim(i, toks), (i, got_fim[i])

    prop()


def test_wordpiece_matches_pure_python(spark):
    """Property: in-engine WordPiece training + maximal-munch encoding
    equals a pure-Python replica — likelihood-scored merges with
    (score DESC, lhs, rhs) ties, greedy non-overlapping application,
    composition-key-max encoding — on randomized corpora."""
    import hashlib
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.bpe import (
        wordpiece_encode,
        wordpiece_train,
    )
    from auraverse_etl_pipeline_spark.operators.unigram import compositions

    M, W = 3, 6
    COMPS = {}
    for wlen, comp, k, s, l in compositions(W, W):
        COMPS.setdefault(wlen, {}).setdefault(comp, []).append((k, s, l))

    def replica_train(texts):
        wf = Counter()
        for t in texts:
            for w in t.split():
                if w:
                    wf[w] += 1
        state = {w: list(w) for w in wf}
        merges = []
        for step in range(M):
            unit, pairs = Counter(), Counter()
            for w, syms in state.items():
                for s in syms:
                    unit[s] += wf[w]
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += wf[w]
            if not pairs:
                break
            # deterministic (score DESC, lhs ASC, rhs ASC)
            best_key, best_score = None, None
            for (a, b), c in pairs.items():
                sc = c / (unit[a] * unit[b])
                cand = (-sc, a, b)
                if best_key is None or cand < best_key:
                    best_key, best_score = cand, (a, b, c, sc)
            a, b, cnt, sc = best_score
            if cnt < 2:
                break
            merges.append((step, a, b, cnt, sc))
            for w, syms in state.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                state[w] = out
        return merges, wf

    def replica_encode(texts, merges, wf):
        vocab = {c for w in wf for c in w} | {a + b for _, a, b, _, _ in merges}
        seg = {}
        for w in wf:
            if len(w) > W:
                continue
            best = None
            for comp, parts in COMPS.get(len(w), {}).items():
                pieces = [w[s - 1 : s - 1 + l] for _, s, l in sorted(parts)]
                if all(p in vocab for p in pieces):
                    if best is None or comp > best[0]:
                        best = (comp, pieces)
            seg[w] = best[1]
        out = {}
        for i, t in enumerate(texts):
            toks = [w for w in t.split() if w and len(w) <= W]
            stream = [" ".join(seg[w]) for w in toks]
            n = sum(len(seg[w]) for w in toks)
            out[i] = (n, hashlib.md5(" ".join(stream).encode()).hexdigest())
        return out

    word = st.sampled_from(["ab", "abab", "ba", "bab", "aab", "c", "cc", "abc", "éb𝄞", "世界"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=3, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=5))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        merges, wf = replica_train(texts)
        got_m = wordpiece_train(df, num_merges=M).collect()
        assert len(got_m) == len(merges)
        for r, (step, a, b, cnt, sc) in zip(sorted(got_m, key=lambda r: r.step), merges):
            assert (r.step, r.lhs, r.rhs, r.pair_count) == (step, a, b, cnt)
            assert r.score == sc, (r, sc)

        enc = wordpiece_encode(df, wordpiece_train(df, num_merges=M), max_word_len=W)
        got_e = {r.id: (r.n_pieces, r.pieces_md5) for r in enc.collect()}
        enc.release_caches()
        want = replica_encode(texts, merges, wf)
        assert got_e == want, (got_e, want)

    prop()


def test_paragraph_dedup_matches_set_model(spark):
    """Property: dedup_paragraphs == a Python first-occurrence model
    (lowest (doc_id, pos) per non-blank paragraph keeps; blanks always
    keep; reassembly in original order), over randomized corpora with
    repeated, blank and unique paragraphs."""
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.dedup import dedup_paragraphs

    # "\t" is CONTENT under the engine rule (Spark/DuckDB trim strips
    # ASCII spaces only), so it participates in dedup like any text.
    para = st.sampled_from(["shared one", "shared two", "unique", " ", "\t", "alpha beta"])
    doc = st.lists(para, min_size=1, max_size=5).map("\n\n".join)

    def model(texts):
        seen: dict[str, tuple[int, int]] = {}
        split = {i: t.split("\n\n") for i, t in enumerate(texts)}
        # blank == ASCII-space-only, matching Spark/DuckDB trim (python
        # str.strip() would also strip tabs/newlines and diverge)
        for i in sorted(split):
            for p_idx, p in enumerate(split[i]):
                if p.strip(" ") and p not in seen:
                    seen[p] = (i, p_idx)
        out = {}
        for i in sorted(split):
            kept = [
                p
                for p_idx, p in enumerate(split[i])
                if not p.strip(" ") or seen[p] == (i, p_idx)
            ]
            dropped = len(split[i]) - len(kept)
            out[i] = ("\n\n".join(kept), len(kept), dropped)
        return out

    @settings(max_examples=4, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=5))
    def prop(texts):
        # hypothesis may repeat whole docs; the model handles it
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got = {
            r.doc_id: (r.text, r.n_paras_kept, r.n_paras_dropped)
            for r in dedup_paragraphs(df).collect()
        }
        assert got == model(texts)

    prop()


def test_psl_matcher_matches_python_model(spark):
    """Property: the Spark PSL matcher == a pure-Python model of the
    PSL algorithm over the committed snapshot (exceptions > longest
    suffix > wildcard > implicit default), on randomized hosts built
    from rule fragments, ports and userinfo."""
    from hypothesis import given, settings, strategies as st

    import pyspark.sql.functions as F

    from auraverse_etl_pipeline_spark.functions.psl import (
        PSL_EXCEPTIONS,
        PSL_MULTILABEL_RULES,
        PSL_WILDCARD_TLDS,
        registrable_domain,
    )

    two = {r for r in PSL_MULTILABEL_RULES if r.count(".") == 1}
    three = {r for r in PSL_MULTILABEL_RULES if r.count(".") == 2}

    def model(host):
        host = host.lower().rsplit("@", 1)[-1]
        import re

        host = re.sub(r":[0-9]+$", "", host)
        labels = host.split(".")
        last2 = ".".join(labels[-2:]) if len(labels) >= 2 else ""
        last3 = ".".join(labels[-3:]) if len(labels) >= 3 else ""
        last4 = ".".join(labels[-4:]) if len(labels) >= 4 else ""
        if last2 and last2 in PSL_EXCEPTIONS:
            return last2
        if last3 in three:
            return last4 if last4 else host
        if labels[-1] in PSL_WILDCARD_TLDS:
            return last3 if last3 else host
        if last2 in two:
            return last3 if last3 else host
        return last2

    label = st.sampled_from(["www", "foo", "bar9", "x"])
    suffix = st.sampled_from(
        ["co.uk", "k12.ma.us", "ck", "www.ck", "net", "example.org", "com.au", "us"]
    )
    host = st.tuples(st.lists(label, min_size=0, max_size=3), suffix).map(
        lambda t: ".".join(t[0] + [t[1]])
    )
    port = st.sampled_from(["", ":80", ":8080"])
    user = st.sampled_from(["", "u:p@"])
    url = st.tuples(user, host, port).map(lambda t: f"http://{t[0]}{t[1]}{t[2]}/x")

    @settings(max_examples=4, deadline=None)
    @given(urls=st.lists(url, min_size=1, max_size=12, unique=True))
    def prop(urls):
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        got = {
            r.u: r.d
            for r in df.select("u", registrable_domain("u").alias("d")).collect()
        }
        import re

        for u in urls:
            h = re.match(r"http://(.*)/x", u).group(1)
            assert got[u] == model(h), (u, got[u], model(h))

    prop()


def test_sq8_matches_pure_python_model(spark):
    """Property: SQ8 stats → encode → reconstruct → asymmetric L2²
    equals a pure-Python replica of the exact IEEE arithmetic
    (min/max stats, clamp(floor((x−vmin)·255/(vmax−vmin)))−128 codes,
    vmin+(c+128)·(vmax−vmin)/255 reconstruction, sequential-fold
    distance), over randomized small corpora including constant and
    negative dimensions."""
    import math

    import pyspark.sql.functions as F
    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        _sq_recon_expr,
        l2_sq_expr,
        sq_encode,
        sq_stats,
    )

    D = 4
    comp = st.sampled_from([-2.5, -1.0, 0.0, 0.25, 1.0, 3.75, 7.0])
    vec = st.lists(comp, min_size=D, max_size=D)

    def model(vecs):
        vmin = [min(v[j] for v in vecs) for j in range(D)]
        vmax = [max(v[j] for v in vecs) for j in range(D)]
        codes = []
        for v in vecs:
            cs = []
            for j in range(D):
                if vmax[j] == vmin[j]:
                    q = 0
                else:
                    q = min(255, max(0, int(math.floor((v[j] - vmin[j]) * 255.0 / (vmax[j] - vmin[j])))))
                cs.append(q - 128)
            codes.append(cs)
        recon = [
            [vmin[j] + (c[j] + 128.0) * (vmax[j] - vmin[j]) / 255.0 for j in range(D)]
            for c in codes
        ]
        return vmin, vmax, codes, recon

    @settings(max_examples=4, deadline=None)
    @given(vecs=st.lists(vec, min_size=2, max_size=6))
    def prop(vecs):
        df = spark.createDataFrame(
            list(enumerate(map(list, vecs))), "vec_id bigint, embedding array<double>"
        )
        stats = sq_stats(df)
        vmin, vmax, codes, recon = model(vecs)
        strow = stats.first()
        assert list(strow.vmin) == vmin and list(strow.vmax) == vmax
        enc = sq_encode(df, stats, dim=D)
        got_codes = {r.id: list(r.codes) for r in enc.collect()}
        assert got_codes == {i: codes[i] for i in range(len(vecs))}
        got_recon = {
            r.id: list(r.rv)
            for r in enc.crossJoin(F.broadcast(stats))
            .select("id", _sq_recon_expr(D).alias("rv"))
            .collect()
        }
        for i in range(len(vecs)):
            assert got_recon[i] == recon[i]  # exact IEEE equality
        # asymmetric distance: sequential fold == python left fold
        q = vecs[0]
        want = {}
        for i, rv in enumerate(recon):
            acc = 0.0
            for j in range(D):
                acc = acc + (q[j] - rv[j]) * (q[j] - rv[j])
            want[i] = acc
        qdf = F.array(*[F.lit(float(x)) for x in q])
        got_d = {
            r.id: r.d
            for r in enc.crossJoin(F.broadcast(stats))
            .select("id", l2_sq_expr(qdf, _sq_recon_expr(D)).alias("d"))
            .collect()
        }
        assert got_d == want

    prop()


def test_stream_semdedup_gate_matches_pure_python(spark, tmp_path):
    """Property: the streaming SemDeDup gate's every verdict equals a
    pure-Python replica of the exact arithmetic — sample-quantizer
    argmax (clamped sequential-fold cosine, ties to the lowest cell),
    day-1 batch drop rule (more-central member of any above-threshold
    in-cell pair, ties to the higher id), then per batch: id anti-join,
    index-wins content dedup against members as of that batch, the
    within-batch centrality rule, members append — on randomized
    dyadic corpora with planted exact and perturbed duplicates."""
    import pyspark.sql.functions as F

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        semdedup_clusters,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate

    DIM, TAU, NLIST = 4, 0.9, 2

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        na = 0.0
        for x in a:
            na = na + x * x
        nb = 0.0
        for y in b:
            nb = nb + y * y
        import math
        return min(1.0, dot / (math.sqrt(na) * math.sqrt(nb)))

    def assign(v, cents):
        scored = [(cos(v, c), -cell) for cell, c in cents]
        best = max(scored)
        return -best[1], best[0]

    def batch_losers(assigned):
        # assigned: {id: (cell, cs, v)}; declarative more-central rule
        losers = set()
        ids = sorted(assigned)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                ca, cb = assigned[a], assigned[b]
                if ca[0] != cb[0]:
                    continue
                if cos(ca[2], cb[2]) < TAU:
                    continue
                if ca[1] > cb[1]:
                    losers.add(a)
                elif ca[1] < cb[1]:
                    losers.add(b)
                else:
                    losers.add(max(a, b))
        return losers

    comp = st.integers(min_value=-64, max_value=64).map(lambda v: v / 64.0)
    vec = st.lists(comp, min_size=DIM, max_size=DIM).filter(
        lambda v: any(x != 0.0 for x in v)
    )
    # each arrival: (source index into the pool, perturbation step)
    arr = st.tuples(st.integers(0, 7), st.integers(0, 3))

    @settings(max_examples=3, deadline=None)
    @given(
        corpus=st.lists(vec, min_size=4, max_size=6),
        b1=st.lists(arr, min_size=1, max_size=3),
        b2=st.lists(arr, min_size=1, max_size=3),
        data=st.data(),
    )
    def prop(corpus, b1, b2, data):
        import shutil
        import uuid

        pool = corpus + [[x + 0.015625 for x in v] for v in corpus]

        def build_batch(spec, base_id):
            rows = []
            for i, (src, step) in enumerate(spec):
                v = pool[src % len(pool)]
                rows.append(
                    (base_id + i, [x + step * 0.03125 for x in v])
                )
            return rows

        rows1 = build_batch(b1, 1000)
        rows2 = build_batch(b2, 2000)
        cdf = spark.createDataFrame(
            list(enumerate(corpus)), "vec_id bigint, embedding array<double>"
        )
        idx = ivf_index(cdf, nlist=NLIST, quantizer="sample")
        verd = semdedup_clusters(cdf, threshold=TAU, index=idx)
        members_df = (
            verd.filter("kept")
            .select("vec_id", F.col("cell").cast("int").alias("cell"), "centroid_cos")
            .join(cdf, "vec_id")
            .select(
                F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
                "cell", "centroid_cos",
            )
        )
        root = tmp_path / f"gate_{uuid.uuid4().hex[:8]}"
        idx.centroids.write.parquet(str(root / "centroids"))
        members_df.write.partitionBy("cell").parquet(str(root / "members"))
        from auraverse_etl_pipeline_spark.streaming.sources import (
            stage_ordered_batches,
        )

        schema = "vec_id bigint, embedding array<double>"
        chunks = root / "chunks"
        stage_ordered_batches(
            [spark.createDataFrame(rows, schema) for rows in (rows1, rows2)],
            str(chunks),
        )
        svec = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(chunks))
        )
        run_stream_semdedup_gate(svec, index_path=str(root), threshold=TAU)
        got = {
            r.id: (r.cell, r.reason)
            for r in spark.read.parquet(str(root / "decisions")).collect()
        }

        # ---- pure-Python replica ----
        cents = sorted(
            (cell, list(c))
            for cell, c in (
                (i, corpus[i]) for i in range(min(NLIST, len(corpus)))
            )
        )
        assigned0 = {}
        for vid, v in enumerate(corpus):
            cell, cs = assign(v, cents)
            assigned0[vid] = (cell, cs, v)
        members = {
            vid: assigned0[vid]
            for vid in assigned0
            if vid not in batch_losers(assigned0)
        }
        want = {}
        for rows in (rows1, rows2):
            batch = {}
            for vid, v in rows:
                if vid in members or vid in batch:
                    continue  # id anti-join (re-ingest / within-batch dup id)
                cell, cs = assign(v, cents)
                batch[vid] = (cell, cs, v)
            survivors = {}
            for vid, (cell, cs, v) in batch.items():
                if any(
                    m[0] == cell and cos(v, m[2]) >= TAU for m in members.values()
                ):
                    want[vid] = (cell, "index_dup")
                else:
                    survivors[vid] = (cell, cs, v)
            dropped = batch_losers(survivors)
            for vid, (cell, cs, v) in survivors.items():
                if vid in dropped:
                    want[vid] = (cell, "batch_dup")
                else:
                    want[vid] = (cell, "kept")
                    members[vid] = (cell, cs, v)
        assert got == want, (got, want)
        shutil.rmtree(root, ignore_errors=True)

    prop()


def test_ivfsq_matches_pure_python_model(spark):
    """Property: IVF,SQ8 equals a pure-Python replica of the exact
    arithmetic on randomized dyadic corpora — sample-quantizer cells,
    clamped sequential-fold probe ranking (ties to the lowest cell),
    SQ8 encode/decode (floor/clamp byte codes against per-dim min/max),
    the asymmetric sequential-fold L2² shortlist over probed cells
    only, and the exact re-rank (ties to the lowest neighbor id)."""
    import math

    from hypothesis import given, settings, strategies as st

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        ivfsq_search,
        sq_encode,
        sq_stats,
    )

    DIM, NLIST, NPROBE, K, SHORT = 4, 2, 1, 2, 3

    def fold(terms):
        acc = 0.0
        for t in terms:
            acc = acc + t
        return acc

    def cos(a, b):
        dot = fold(x * y for x, y in zip(a, b))
        na = math.sqrt(fold(x * x for x in a))
        nb = math.sqrt(fold(y * y for y in b))
        return dot / (na * nb)

    def l2(a, b):
        return fold((x - y) * (x - y) for x, y in zip(a, b))

    comp = st.integers(min_value=-64, max_value=64).map(lambda v: v / 64.0)
    vec = st.lists(comp, min_size=DIM, max_size=DIM).filter(
        lambda v: any(x != 0.0 for x in v)
    )

    @settings(max_examples=4, deadline=None)
    @given(
        corpus=st.lists(vec, min_size=5, max_size=9),
        queries=st.lists(vec, min_size=1, max_size=2),
    )
    def prop(corpus, queries):
        crows = [(i + 10, v) for i, v in enumerate(corpus)]
        qrows = [(i, v) for i, v in enumerate(queries)]
        cdf = spark.createDataFrame(crows, "vec_id bigint, embedding array<double>")
        qdf = spark.createDataFrame(qrows, "vec_id bigint, embedding array<double>")
        idx = ivf_index(cdf, nlist=NLIST, quantizer="sample")
        stats = sq_stats(cdf).cache()
        codes = sq_encode(cdf, stats, dim=DIM)
        out = ivfsq_search(
            qdf, idx, codes, stats, corpus=cdf,
            k=K, nprobe=NPROBE, shortlist=SHORT, dim=DIM,
        )
        got = sorted(
            (r.query_id, r.rank, r.neighbor_id, r.l2_sq) for r in out.collect()
        )
        out.release_caches()  # the operator's probes cache
        stats.unpersist()

        # ---- pure-Python replica ----
        cents = [(cell, crows[cell][1]) for cell in range(min(NLIST, len(crows)))]
        assigned = {}
        for vid, v in crows:
            best = max((min(1.0, cos(v, c)), -cell) for cell, c in cents)
            assigned[vid] = -best[1]
        vmin = [min(v[j] for _, v in crows) for j in range(DIM)]
        vmax = [max(v[j] for _, v in crows) for j in range(DIM)]

        def code(v):
            out = []
            for j in range(DIM):
                if vmax[j] == vmin[j]:
                    c = 0
                else:
                    c = int(math.floor((v[j] - vmin[j]) * 255.0 / (vmax[j] - vmin[j])))
                    c = min(255, max(0, c))
                out.append(c - 128)
            return out

        def recon(cd):
            return [
                vmin[j] + (cd[j] + 128.0) * (vmax[j] - vmin[j]) / 255.0
                for j in range(DIM)
            ]

        want = []
        for qid, qv in qrows:
            probe = sorted(
                ((min(1.0, cos(qv, c)), -cell) for cell, c in cents), reverse=True
            )[:NPROBE]
            cells = {-x[1] for x in probe}
            cand = [
                (l2(qv, recon(code(v))), vid)
                for vid, v in crows
                if assigned[vid] in cells
            ]
            short = [vid for _, vid in sorted(cand)[:SHORT]]
            rer = sorted((l2(qv, dict(crows)[vid]), vid) for vid in short)
            for rank, (d, vid) in enumerate(rer[:K], start=1):
                want.append((qid, rank, vid, d))
        assert got == sorted(want), (got, sorted(want))

    prop()


def test_compact_decisions_matches_model(spark, tmp_path):
    """Randomized multi-batch decision logs vs a pure-Python
    latest-per-id replica: arbitrary id overlap patterns, gap batches,
    composite id keys, and single-batch logs all compact to exactly
    the model's answer."""
    import random

    from auraverse_etl_pipeline_spark.sources.sinks import compact_decisions

    rng = random.Random(1307)
    for trial in range(4):
        n_batches = rng.randint(1, 6)
        ids = list(range(rng.randint(5, 60)))
        model: dict[tuple, tuple] = {}
        path = str(tmp_path / f"fuzz_log_{trial}")
        schema = "src string, id bigint, batch_id bigint, kept boolean, note string"
        for b in range(1, n_batches + 1):
            scored = rng.sample(ids, rng.randint(1, len(ids)))
            rows = []
            for i in scored:
                src = rng.choice(["gate_a", "gate_b"])
                kept = rng.random() < 0.5
                note = f"b{b}i{i}"
                rows.append((src, i, b, kept, note))
                model[(src, i)] = (b, kept, note)
            spark.createDataFrame(rows, schema).coalesce(
                rng.randint(1, 3)
            ).write.mode("append").parquet(path)
        out = compact_decisions(
            spark, path, order_col="batch_id", id_cols=("src", "id")
        )
        got = {(r.src, r.id): (r.batch_id, r.kept, r.note) for r in out.collect()}
        assert got == model, f"trial {trial}"


def test_retrieval_quality_audit_matches_model(spark):
    """Randomized rankings/truth vs a pure-Python nDCG replica: the
    operator's rank-sorted ordered fold must equal a left-to-right
    Python sum with math.log2 BIT-FOR-BIT (same association, same
    libm), across truncated lists, out-of-truth docs, tied grades and
    multi-system frames."""
    import math
    import random

    from auraverse_etl_pipeline_spark.operators.retrieval import (
        retrieval_quality_audit,
    )

    rng = random.Random(1313)
    for trial in range(3):
        k = rng.choice([3, 5, 10])
        n_q = rng.randint(1, 4)
        systems = ["s1", "s2", "s3"][: rng.randint(1, 3)]
        truth_rows, run_rows = [], []
        truth: dict[int, dict[int, int]] = {}
        for q in range(n_q):
            docs = rng.sample(range(100), rng.randint(2, 15))
            truth[q] = {d: rng.randint(0, 5) for d in docs}
            truth_rows += [(q, d, r) for d, r in truth[q].items()]
            for s in systems:
                ranked = rng.sample(range(120), rng.randint(1, k + 4))
                run_rows += [(s, q, d, i + 1) for i, d in enumerate(ranked)]
        runs = spark.createDataFrame(
            run_rows, "system string, query_id bigint, doc_id bigint, rank bigint"
        )
        tr = spark.createDataFrame(
            truth_rows, "query_id bigint, doc_id bigint, rel bigint"
        )
        got = {
            (r.system, r.query_id): (r.dcg, r.idcg, r.ndcg)
            for r in retrieval_quality_audit(runs, tr, k=k).collect()
        }

        def dcg(pairs):  # [(rank, rel)] rank-ascending, left-to-right sum
            acc = 0.0
            for rank, rel in sorted(pairs):
                acc = acc + float(rel) / math.log2(rank + 1)
            return acc

        for q in range(n_q):
            ideal = sorted(truth[q].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            idcg = dcg([(i + 1, rel) for i, (_, rel) in enumerate(ideal)])
            for s in systems:
                mine = [
                    (rank, truth[q].get(d, 0))
                    for (sy, qq, d, rank) in run_rows
                    if sy == s and qq == q and rank <= k
                ]
                want = dcg(mine)
                assert got[(s, q)] == (want, idcg, want / idcg), (trial, s, q)


def test_exact_substring_matches_model(spark):
    """duplicate_token_spans / strip_duplicate_spans vs a pure-Python
    reference model on tiny-vocab corpora (maximal hash-group
    collisions): keep-first ranking, island merge, boilerplate-cap
    delete-all, and reassembly all agree exactly."""
    import re
    from collections import defaultdict

    from auraverse_etl_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
        strip_duplicate_spans,
    )

    def model(rows, k, cap=None):
        toks = {d: re.split(r"\s+", (t or "").strip()) for d, t in rows}
        groups = defaultdict(list)
        for d in sorted(toks):
            tk = toks[d]
            for p in range(len(tk) - k + 1):
                groups[" ".join(tk[p : p + k])].append((d, p))
        covered = set()
        for lst in groups.values():
            lst.sort()
            losers = lst[1:] if (cap is None or len(lst) <= cap) else lst
            covered.update(losers)
        bydoc = defaultdict(list)
        for d, p in covered:
            bydoc[d].append(p)
        spans = []
        for d, ps in bydoc.items():
            ps.sort()
            s, e = ps[0], ps[0] + k
            for p in ps[1:]:
                if p > e:
                    spans.append((d, s, e, e - s))
                    s, e = p, p + k
                else:
                    e = p + k
            spans.append((d, s, e, e - s))
        strip = {}
        for d, tk in toks.items():
            covpos = {i for (dd, p) in covered if dd == d for i in range(p, p + k)}
            keep = [t for i, t in enumerate(tk) if i not in covpos]
            strip[d] = (" ".join(keep), len(keep), len(tk) - len(keep))
        return sorted(spans), strip

    tok = st.sampled_from(["a", "b", "c"])
    doc = st.lists(tok, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(
        texts=st.lists(doc, min_size=1, max_size=5),
        cap=st.sampled_from([None, 1, 2]),
    )
    def run(texts, cap):
        rows = [(i + 1, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        want_spans, want_strip = model(rows, k=3, cap=cap)
        got_spans = sorted(
            tuple(r)
            for r in duplicate_token_spans(df, k=3, boilerplate_cap=cap).collect()
        )
        assert got_spans == want_spans
        got_strip = {
            r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
            for r in strip_duplicate_spans(df, k=3, boilerplate_cap=cap).collect()
        }
        assert got_strip == want_strip
        for d, s, e, n in got_spans:  # structural invariants
            assert 0 <= s < e and n == e - s >= 3

    run()
