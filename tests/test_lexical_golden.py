"""Golden fixtures for the native lexical engine: scores hand-derived from
the PUBLISHED formulas, frozen as literals (VERDICT r2 item 5 — the engine
was previously validated only against an in-repo NumPy twin of the same
code, which is circular for formula correctness).

Corpus (stem=False so tokens are literal; k1=1.2, b=0.75):

    d0: "apple banana apple"          dl=3   apple:2  banana:1
    d1: "banana cherry"               dl=2
    d2: "cherry cherry cherry durian" dl=4   cherry:3 durian:1
    d3: "apple durian"                dl=2

  N=4, total_len=11, avgdl=2.75
  df: every term = 2        cf: apple 3, banana 2, cherry 4, durian 2

BM25 (Robertson/Lucene idf):  idf(df=2) = ln((4-2+0.5)/(2+0.5)+1) = ln 2
  length norm K(dl) = k1*(1-b+b*dl/avgdl):
    K(3) = 1.2*(0.25+0.75*3/2.75)  = 1.281818181818182
    K(2) = 1.2*(0.25+0.75*2/2.75)  = 0.954545454545455
    K(4) = 1.2*(0.25+0.75*4/2.75)  = 1.609090909090909
  score(tf, dl) = ln2 * tf*(k1+1)/(tf+K(dl))

DPH (Terrier):  f=tf/dl, norm=(1-f)^2/(tf+1),
  score = norm * (tf*log2(tf*avgdl/dl * N/cf) + 0.5*log2(2*pi*tf*(1-f)))

Bo1 (Bose-Einstein, fb over top-1 doc of "apple" = d0 {apple:2, banana:1}):
  Pn = cf/N;  w(t) = tf_fb*log2((1+Pn)/Pn) + log2(1+Pn)
    w(apple)  = 2*log2(1.75/0.75)+log2(1.75) = 3.252139764730500
    w(banana) = 1*log2(1.5/0.5)  +log2(1.5)  = 2.169925001442312
  Rocchio merge (beta=0.4, /max_w):
    q(apple)  = 1 + 0.4            = 1.4
    q(banana) = 0.4*w(banana)/w(apple) = 0.266891973706072

Every literal below was computed by hand from these formulas (derivation
above; arithmetic done independently of the engine), then frozen.
Reference anchor: the reference's numbers come from Terrier/PISA
(utilities/compute_all_bm25.py:26-27, distill/mine_negatives.py:69-77).
"""

import numpy as np
import pytest

from pacednegatives_tpu.index.bm25 import (
    MODEL_BM25,
    MODEL_DPH,
    QE_BO1,
    LexicalIndex,
)

DOCS = [
    "apple banana apple",
    "banana cherry",
    "cherry cherry cherry durian",
    "apple durian",
]

# BM25 per-(term, doc) golden values (ln2 * tf*2.2/(tf+K(dl)))
BM25_APPLE_D0 = 0.9293164415263532   # tf=2, K(3)
BM25_APPLE_D3 = 0.7801935706767756   # tf=1, K(2)
BM25_BANANA_D0 = 0.6682932975916603  # tf=1, K(3)
BM25_BANANA_D1 = 0.7801935706767756  # tf=1, K(2)
BM25_CHERRY_D2 = 0.9925539508609866  # tf=3, K(4)
BM25_DURIAN_D2 = 0.5844655668832989  # tf=1, K(4)

DPH_CHERRY_D2 = 0.06642830739331403
DPH_APPLE_D0 = 0.13378814995427968

BO1_APPLE_D0 = 1.479405135345672     # 1.4*BM25_APPLE_D0 + 0.26689...*BM25_BANANA_D0
BO1_APPLE_D1 = 0.20822740195071268   # 0.26689...*BM25_BANANA_D1
BO1_APPLE_D3 = 1.092270998947486     # 1.4*BM25_APPLE_D3


@pytest.fixture(scope="module", params=["native", "python"])
def index(request):
    ix = LexicalIndex.build(DOCS, use_native=request.param == "native",
                            stem=False)
    if request.param == "native" and not ix.native:
        pytest.skip("native lexical library failed to build")
    return ix


def _scores(ix, query, **kw):
    ids, scores = ix.search(query, k=4, **kw)
    return dict(zip((int(i) for i in ids), (float(s) for s in scores)))


def test_bm25_single_term_golden(index):
    got = _scores(index, "apple")
    assert set(got) == {0, 3}
    np.testing.assert_allclose(got[0], BM25_APPLE_D0, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got[3], BM25_APPLE_D3, rtol=0, atol=1e-9)


def test_bm25_multi_term_golden(index):
    got = _scores(index, "cherry durian")
    np.testing.assert_allclose(
        got[2], BM25_CHERRY_D2 + BM25_DURIAN_D2, rtol=0, atol=1e-9
    )
    # d1 matches cherry only (tf=1, dl=2 — same shape as banana@d1)
    np.testing.assert_allclose(got[1], BM25_BANANA_D1, rtol=0, atol=1e-9)


def test_bm25_repeated_query_term_doubles_weight(index):
    # query term weight is its count in the query
    got = _scores(index, "apple apple")
    np.testing.assert_allclose(got[0], 2 * BM25_APPLE_D0, rtol=0, atol=1e-9)


def test_dph_golden(index):
    if not index.native:
        pytest.skip("python fallback is BM25-only")
    got = _scores(index, "cherry", model=MODEL_DPH)
    np.testing.assert_allclose(got[2], DPH_CHERRY_D2, rtol=0, atol=1e-9)
    got = _scores(index, "apple", model=MODEL_DPH)
    np.testing.assert_allclose(got[0], DPH_APPLE_D0, rtol=0, atol=1e-9)


def test_bo1_expansion_golden(index):
    if not index.native:
        pytest.skip("python fallback has no query expansion")
    got = _scores(index, "apple", qe=QE_BO1, fb_docs=1, fb_terms=10)
    # expansion pulls in banana -> d1 now matches; weights per the worked
    # Rocchio merge in the module docstring
    assert set(got) == {0, 1, 3}
    np.testing.assert_allclose(got[0], BO1_APPLE_D0, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got[1], BO1_APPLE_D1, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got[3], BO1_APPLE_D3, rtol=0, atol=1e-9)


def test_score_pair_matches_golden(index):
    np.testing.assert_allclose(
        index.score_pair("apple", 0), BM25_APPLE_D0, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        index.score_pair("cherry durian", 2),
        BM25_CHERRY_D2 + BM25_DURIAN_D2, rtol=0, atol=1e-9,
    )
