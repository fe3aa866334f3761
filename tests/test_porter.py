"""Porter stemmer + lexical-scoring golden fixtures.

Validates the native index's scoring stack against independently-computed
Terrier-formula values (VERDICT round-1 item 6): the C++ and Python Porter
stemmers word-for-word against the published algorithm's sample vocabulary,
and BM25/DPH/Bo1/KL/RM3 scores on a tiny fixed corpus against a from-the-
published-formulas NumPy oracle plus frozen numeric golden values.
"""

import math

import numpy as np
import pytest

from pacednegatives_tpu.index.bm25 import (
    MODEL_BM25,
    MODEL_DPH,
    QE_BO1,
    QE_KL,
    QE_RM3,
    LexicalIndex,
    native_stem,
)
from pacednegatives_tpu.index.porter import stem as py_stem

# ---------------------------------------------------------------------------
# Stemmer: end-to-end outputs for the sample vocabulary in the published
# algorithm description (Porter 1980), plus the two published amendments
# (step-2 bli->ble, logi->log). Values are the OFFICIAL reference outputs.
# ---------------------------------------------------------------------------

GOLDEN_STEMS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2 (end-to-end through steps 4/5)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "analogi": "analog",  # logi->log amendment
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words unchanged
    "a": "a", "is": "is", "be": "be",
}


def test_python_stemmer_matches_published_vocabulary():
    for w, g in GOLDEN_STEMS.items():
        assert py_stem(w) == g, f"{w}: {py_stem(w)} != {g}"


def test_native_stemmer_matches_python_twin():
    if native_stem("testing") is None:
        pytest.skip("native lexical library unavailable")
    for w, g in GOLDEN_STEMS.items():
        assert native_stem(w) == g, f"{w}: {native_stem(w)} != {g}"
    # broader sweep: synthetic-ish word list
    words = (
        "running runner ran runs easily fairly generalization "
        "international internationalization arguments argued arguing "
        "optimization optimizer retrieval retrieved retrieving documents "
        "passages queries ranking ranked relevance relevant probabilistic"
    ).split()
    for w in words:
        assert native_stem(w) == py_stem(w), w


# ---------------------------------------------------------------------------
# Scoring golden fixtures. Tiny corpus; expected values computed with an
# independent NumPy oracle straight from the published formulas
# (Robertson BM25 as used by Terrier, Terrier DPH, Bo1/KL term weights with
# the Rocchio beta=0.4 merge, RM3 with Dirichlet mu).
# ---------------------------------------------------------------------------

# Stemming is ON: e.g. "jumps"->"jump", "jumping"->"jump" collide by design.
FIX_DOCS = [
    "the cat jumps over the fence",            # 0
    "a dog was jumping over fences all day",   # 1
    "cats and dogs are common pets",           # 2
    "stock prices are jumping this quarter",   # 3
    "the quarterly stock report",              # 4
]


def _tok(text):
    import re

    return [py_stem(t) for t in re.findall(r"[a-z0-9]+", text.lower())]


class Oracle:
    def __init__(self, docs):
        self.docs = [_tok(d) for d in docs]
        self.N = len(docs)
        self.doc_len = [len(d) for d in self.docs]
        self.avgdl = sum(self.doc_len) / self.N
        self.coll_len = sum(self.doc_len)
        from collections import Counter

        self.tfs = [Counter(d) for d in self.docs]
        self.df = Counter()
        self.cf = Counter()
        # term ids in first-occurrence order — the native dict's id
        # assignment, used for deterministic tie-breaks in term selection
        self.tid = {}
        for d in self.docs:
            for t in d:
                self.tid.setdefault(t, len(self.tid))
        for tf in self.tfs:
            for t, f in tf.items():
                self.df[t] += 1
                self.cf[t] += f

    def bm25(self, wq, d, k1=1.2, b=0.75):
        s = 0.0
        for t, qw in wq.items():
            tf = self.tfs[d].get(t, 0)
            if not tf:
                continue
            idf = math.log((self.N - self.df[t] + 0.5) / (self.df[t] + 0.5) + 1)
            s += qw * idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * self.doc_len[d] / self.avgdl)
            )
        return s

    def dph(self, wq, d):
        s = 0.0
        for t, qw in wq.items():
            tf = self.tfs[d].get(t, 0)
            dl = self.doc_len[d]
            if not tf or 1 - tf / dl < 1e-12:
                continue
            f = tf / dl
            norm = (1 - f) ** 2 / (tf + 1)
            val = tf * math.log2(tf * self.avgdl / dl * self.N / self.cf[t]) \
                + 0.5 * math.log2(2 * math.pi * tf * (1 - f))
            s += qw * norm * val
        return s

    def _query(self, q):
        from collections import Counter

        return Counter(t for t in _tok(q) if t in self.df)

    def search(self, q, model="bm25", **kw):
        wq = self._query(q)
        fn = self.bm25 if model == "bm25" else self.dph
        scores = [fn(wq, d, **kw) if model == "bm25" else fn(wq, d)
                  for d in range(self.N)]
        order = sorted(
            (d for d in range(self.N) if scores[d] != 0.0),
            key=lambda d: (-scores[d], d),
        )
        return order, [scores[d] for d in order]

    def expand(self, q, fb_docs, fb_terms, qe, rm3_lambda=0.6, rm3_mu=2500.0):
        """Terrier-formula expansion over a first-pass BM25 ranking."""
        from collections import Counter

        wq = self._query(q)
        order, _ = self.search(q)
        fb = order[:fb_docs]
        ftf = Counter()
        for d in fb:
            ftf.update(self.tfs[d])
        fb_len = sum(ftf.values())

        scored = []
        for t, f in ftf.items():
            cf = self.cf[t]
            if qe == "bo1":
                pn = cf / self.N
                w = f * math.log2((1 + pn) / pn) + math.log2(1 + pn)
            elif qe == "kl":
                pf, pc = f / fb_len, cf / self.coll_len
                w = pf * math.log2(pf / pc) if pf > pc else 0.0
            else:  # rm3
                pc = cf / self.coll_len
                w = (f + rm3_mu * pc) / (fb_len + rm3_mu)
            if w > 0:
                scored.append((t, w))
        scored.sort(key=lambda x: (-x[1], self.tid[x[0]]))
        scored = scored[:fb_terms]
        out = Counter()
        if qe == "rm3":
            qlen = sum(wq.values())
            for t, w in wq.items():
                out[t] += rm3_lambda * w / qlen
            tot = sum(w for _, w in scored)
            for t, w in scored:
                out[t] += (1 - rm3_lambda) * w / tot
        else:
            maxw = max((w for _, w in scored), default=1e-12)
            out.update(wq)
            for t, w in scored:
                out[t] += 0.4 * w / maxw
        return out

    def search_expanded(self, q, qe, fb_docs=3, fb_terms=10, rm3_lambda=0.6):
        wq = self.expand(q, fb_docs, fb_terms, qe, rm3_lambda)
        scores = [self.bm25(wq, d) for d in range(self.N)]
        order = sorted(
            (d for d in range(self.N) if scores[d] != 0.0),
            key=lambda d: (-scores[d], d),
        )
        return order, [scores[d] for d in order]


@pytest.fixture(scope="module")
def fix_index():
    ix = LexicalIndex.build(FIX_DOCS)
    if not ix.native:
        pytest.skip("native lexical library unavailable")
    return ix


@pytest.fixture(scope="module")
def oracle():
    return Oracle(FIX_DOCS)


def test_stemmed_retrieval_collapses_morphology(fix_index):
    # "jump" must match jumps/jumping across docs 0,1,3 — only possible
    # with stemming (the reference's terrier_stemmed behavior)
    ids, _ = fix_index.search("jump", k=5)
    assert set(ids) == {0, 1, 3}
    # unstemmed index must NOT collapse
    raw = LexicalIndex.build(FIX_DOCS, stem=False)
    ids_raw, _ = raw.search("jump", k=5)
    assert len(ids_raw) == 0


@pytest.mark.parametrize("q", ["jumping cat", "stock quarter", "dogs", "cats fences"])
def test_bm25_matches_formula_oracle(fix_index, oracle, q):
    ids, scores = fix_index.search(q, k=5)
    oids, oscores = oracle.search(q)
    np.testing.assert_array_equal(ids, oids)
    np.testing.assert_allclose(scores, oscores, rtol=1e-12)


@pytest.mark.parametrize("q", ["jumping cat", "stock quarter", "dogs day"])
def test_dph_matches_formula_oracle(fix_index, oracle, q):
    ids, scores = fix_index.search(q, k=5, model=MODEL_DPH)
    oids, oscores = oracle.search(q, model="dph")
    np.testing.assert_array_equal(ids, oids)
    np.testing.assert_allclose(scores, oscores, rtol=1e-12)


@pytest.mark.parametrize(
    "qe,name", [(QE_BO1, "bo1"), (QE_KL, "kl"), (QE_RM3, "rm3")]
)
def test_query_expansion_matches_formula_oracle(fix_index, oracle, qe, name):
    q = "jumping cat"
    ids, scores = fix_index.search(q, k=5, qe=qe, fb_docs=2, fb_terms=5)
    oids, oscores = oracle.search_expanded(q, name, fb_docs=2, fb_terms=5)
    np.testing.assert_array_equal(ids, oids)
    np.testing.assert_allclose(scores, oscores, rtol=1e-12)


def test_frozen_golden_values(fix_index):
    """Numeric freeze: spot values hand-derived from the Terrier formulas on
    FIX_DOCS (stemmed: jumps/jumping->jump, so df('jump')=3). Stemmed doc
    lens are [6,8,6,6,4] (avgdl=6.0 — note was->wa, this->thi,
    quarterly->quarterli, which does NOT collide with quarter).

    BM25 'jump' in doc0: tf=1, dl=6=avgdl, so the length norm cancels:
    score = idf = ln((5-3+0.5)/(3+0.5) + 1) = ln(12/7).
    """
    idf = math.log((5 - 3 + 0.5) / (3 + 0.5) + 1.0)
    got = fix_index.score_pair("jump", 0)
    np.testing.assert_allclose(got, idf, rtol=1e-12)
    np.testing.assert_allclose(got, math.log(12 / 7), rtol=1e-12)
    np.testing.assert_allclose(got, 0.5389965, rtol=1e-6)

    # DPH 'quarter': only doc3 (tf=1, dl=6, cf=1): norm = (1-1/6)^2/2,
    # val = log2(1*(6/6)*(5/1)) + 0.5*log2(2*pi*1*(5/6))
    norm = (1 - 1 / 6) ** 2 / 2
    val = math.log2(5.0) + 0.5 * math.log2(2 * math.pi * (5 / 6))
    got = fix_index.score_pair("quarter", 3, model=MODEL_DPH)
    np.testing.assert_allclose(got, norm * val, rtol=1e-12)
    np.testing.assert_allclose(got, 1.2208885, rtol=1e-6)
