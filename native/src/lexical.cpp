// lexical.cpp — in-memory inverted index with BM25/DPH scoring and
// Bo1/KL/RM3 pseudo-relevance-feedback query expansion.
//
// Replaces the reference's external native retrieval systems (PISA C++ via
// pyterrier_pisa, Terrier Java via pyterrier — reference
// utilities/compute_all_bm25.py:5, distill/mine_negatives.py:69-77) with an
// in-repo C++ library exposed through a C ABI (ctypes-friendly; no pybind11
// in this toolchain).
//
// Scoring models:
//   BM25 (Robertson):  idf = ln((N - df + 0.5)/(df + 0.5) + 1)
//   DPH (divergence from randomness, parameter-free)
// Query expansion (over top fb_docs of an initial BM25 pass):
//   Bo1 (Bose-Einstein), KL (Kullback-Leibler), RM3 (relevance model,
//   Dirichlet-smoothed, interpolated with the original query).
//
// Tokenization: lowercase, split on non-alphanumeric, then (flag-gated,
// default on from the Python wrapper) classic Porter stemming — matching
// the reference's *stemmed* Terrier/PISA indexes
// (utilities/compute_all_bm25.py:26-27 `terrier_stemmed`, eval.py:12).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "porter.h"

namespace {

struct Posting {
  int32_t doc;
  int32_t tf;
};

struct Index {
  bool stem = false;
  std::unordered_map<std::string, int32_t> dict;
  std::vector<std::vector<Posting>> postings;  // term -> postings
  std::vector<std::vector<Posting>> fwd;       // doc -> (term, tf) vector
  std::vector<int64_t> cf;                     // collection frequency
  std::vector<int32_t> doc_len;
  int64_t total_len = 0;
  bool finalized = false;

  double avgdl() const {
    return doc_len.empty() ? 0.0
                           : double(total_len) / double(doc_len.size());
  }
  int32_t n_docs() const { return int32_t(doc_len.size()); }
};

void tokenize(const char* text, bool stem, std::vector<std::string>& out) {
  out.clear();
  std::string cur;
  auto flush = [&]() {
    if (cur.empty()) return;
    if (stem) porter::stem(cur);
    out.push_back(cur);
    cur.clear();
  };
  for (const char* p = text; *p; ++p) {
    unsigned char c = (unsigned char)*p;
    if (std::isalnum(c)) {
      cur.push_back((char)std::tolower(c));
    } else {
      flush();
    }
  }
  flush();
}

// term -> weight map for (possibly expanded) queries
using WeightedQuery = std::vector<std::pair<int32_t, double>>;

double bm25_term(double tf, double dl, double avgdl, double df, double N,
                 double k1, double b) {
  double idf = std::log((N - df + 0.5) / (df + 0.5) + 1.0);
  double denom = tf + k1 * (1.0 - b + b * dl / avgdl);
  return idf * tf * (k1 + 1.0) / denom;
}

double dph_term(double tf, double dl, double avgdl, double cf, double N) {
  // DPH: parameter-free hypergeometric divergence (Terrier formulation).
  if (tf <= 0 || dl <= 0) return 0.0;
  double f = tf / dl;
  // tf == dl (a document of one repeated term): norm -> 0 while the log
  // term -> -inf; the limit of the product is 0, but evaluating it yields
  // 0 * -inf = NaN, which poisons rankings and breaks partial_sort.
  if (1.0 - f < 1e-12) return 0.0;
  double norm = (1.0 - f) * (1.0 - f) / (tf + 1.0);
  double val = tf * std::log2(tf * avgdl / dl * (N / cf)) +
               0.5 * std::log2(2.0 * M_PI * tf * (1.0 - f));
  return norm * val;
}

void score_query(const Index& ix, const WeightedQuery& q, int model,
                 double k1, double b, std::vector<double>& acc) {
  const double N = ix.n_docs();
  const double avgdl = ix.avgdl();
  std::fill(acc.begin(), acc.end(), 0.0);
  for (const auto& [term, qw] : q) {
    if (term < 0 || term >= (int32_t)ix.postings.size()) continue;
    const auto& pl = ix.postings[term];
    const double df = pl.size();
    const double cf = double(ix.cf[term]);
    for (const auto& p : pl) {
      double s;
      if (model == 0) {
        s = bm25_term(p.tf, ix.doc_len[p.doc], avgdl, df, N, k1, b);
      } else {
        s = dph_term(p.tf, ix.doc_len[p.doc], avgdl, cf, N);
      }
      acc[p.doc] += qw * s;
    }
  }
}

int topk_from_acc(const std::vector<double>& acc, int k, int32_t* out_ids,
                  double* out_scores) {
  std::vector<int32_t> cand;
  cand.reserve(1024);
  for (int32_t d = 0; d < (int32_t)acc.size(); ++d)
    if (acc[d] != 0.0) cand.push_back(d);
  int n = std::min<int>(k, cand.size());
  std::partial_sort(
      cand.begin(), cand.begin() + n, cand.end(),
      [&](int32_t a, int32_t c) {
        if (acc[a] != acc[c]) return acc[a] > acc[c];
        return a < c;  // deterministic tie-break
      });
  for (int i = 0; i < n; ++i) {
    out_ids[i] = cand[i];
    out_scores[i] = acc[cand[i]];
  }
  return n;
}

WeightedQuery parse_query(Index& ix, const char* text, bool create_terms) {
  std::vector<std::string> toks;
  tokenize(text, ix.stem, toks);
  std::unordered_map<int32_t, double> w;
  for (auto& t : toks) {
    auto it = ix.dict.find(t);
    if (it == ix.dict.end()) continue;
    w[it->second] += 1.0;
  }
  (void)create_terms;
  return WeightedQuery(w.begin(), w.end());
}

// --- pseudo-relevance feedback -------------------------------------------

// Collect term frequencies over the top fb_docs documents via the
// doc-major forward index: O(sum of feedback doc lengths), not
// O(total index postings).
std::unordered_map<int32_t, double> feedback_tf(const Index& ix,
                                                const int32_t* docs, int nd) {
  std::unordered_map<int32_t, double> tf;
  for (int i = 0; i < nd; ++i) {
    for (const auto& p : ix.fwd[docs[i]]) tf[p.doc /*term id*/] += p.tf;
  }
  return tf;
}

WeightedQuery expand_query(const Index& ix, const WeightedQuery& orig,
                           const int32_t* fb_docs, int nd, int fb_terms,
                           int qe_model /*1=bo1 2=kl 3=rm3*/,
                           double rm3_lambda, double rm3_mu) {
  auto fb = feedback_tf(ix, fb_docs, nd);
  double fb_len = 0;
  for (auto& [t, f] : fb) fb_len += f;
  const double N = ix.n_docs();
  const double coll_len = double(ix.total_len);

  std::vector<std::pair<int32_t, double>> scored;
  scored.reserve(fb.size());
  for (auto& [t, f] : fb) {
    double w = 0.0;
    double cf = double(ix.cf[t]);
    if (qe_model == 1) {  // Bo1: Bose-Einstein
      double Pn = cf / N;
      w = f * std::log2((1.0 + Pn) / Pn) + std::log2(1.0 + Pn);
    } else if (qe_model == 2) {  // KL
      double pf = f / fb_len;
      double pc = cf / coll_len;
      if (pf > pc) w = pf * std::log2(pf / pc);
    } else {  // RM3: P(t|R) ~ mean over fb docs of Dirichlet-smoothed P(t|d)
      // approximated over the pooled feedback pseudo-document
      double pc = cf / coll_len;
      w = (f + rm3_mu * pc) / (fb_len + rm3_mu);
    }
    if (w > 0) scored.push_back({t, w});
  }
  int n = std::min<int>(fb_terms, scored.size());
  std::partial_sort(scored.begin(), scored.begin() + n, scored.end(),
                    [](auto& a, auto& b) {
                      if (a.second != b.second) return a.second > b.second;
                      return a.first < b.first;  // deterministic tie-break
                    });
  scored.resize(n);

  double maxw = 1e-12;
  for (auto& [t, w] : scored) maxw = std::max(maxw, w);

  std::unordered_map<int32_t, double> out;
  if (qe_model == 3) {
    // RM3 interpolation: lambda * P(t|q) + (1-lambda) * P(t|R)
    double qlen = 0;
    for (auto& [t, w] : orig) qlen += w;
    for (auto& [t, w] : orig) out[t] += rm3_lambda * (w / qlen);
    double sum = 0;
    for (auto& [t, w] : scored) sum += w;
    for (auto& [t, w] : scored) out[t] += (1.0 - rm3_lambda) * (w / sum);
  } else {
    // Terrier-style Rocchio merge: qtw + beta * w / max_w
    const double beta = 0.4;
    for (auto& [t, w] : orig) out[t] += w;
    for (auto& [t, w] : scored) out[t] += beta * w / maxw;
  }
  return WeightedQuery(out.begin(), out.end());
}

}  // namespace

extern "C" {

// stem != 0 applies classic Porter stemming to documents AND queries
// (Terrier termpipeline parity; see porter.h).
void* lex_create(int stem) {
  Index* ix = new Index();
  ix->stem = stem != 0;
  return ix;
}

void lex_free(void* h) { delete static_cast<Index*>(h); }

void lex_add_doc(void* h, const char* text) {
  Index& ix = *static_cast<Index*>(h);
  std::vector<std::string> toks;
  tokenize(text, ix.stem, toks);
  int32_t doc = ix.n_docs();
  std::unordered_map<int32_t, int32_t> tf;
  for (auto& t : toks) {
    auto it = ix.dict.find(t);
    int32_t id;
    if (it == ix.dict.end()) {
      id = int32_t(ix.dict.size());
      ix.dict.emplace(t, id);
      ix.postings.emplace_back();
      ix.cf.push_back(0);
    } else {
      id = it->second;
    }
    tf[id] += 1;
  }
  ix.fwd.emplace_back();
  ix.fwd.back().reserve(tf.size());
  for (auto& [id, f] : tf) {
    ix.postings[id].push_back({doc, f});
    ix.fwd.back().push_back({id, f});
    ix.cf[id] += f;
  }
  ix.doc_len.push_back(int32_t(toks.size()));
  ix.total_len += int64_t(toks.size());
}

// Stem one lowercase token into out (cap bytes incl. NUL); returns the
// stemmed length. Exposed so tests can cross-validate the C++ stemmer
// against the Python twin word-for-word.
int lex_stem(const char* word, char* out, int cap) {
  std::string w(word);
  porter::stem(w);
  int n = int(std::min<size_t>(w.size(), size_t(cap > 0 ? cap - 1 : 0)));
  std::memcpy(out, w.data(), n);
  out[n] = '\0';
  return n;
}

int lex_num_docs(void* h) { return static_cast<Index*>(h)->n_docs(); }
int lex_num_terms(void* h) {
  return int(static_cast<Index*>(h)->dict.size());
}

// model: 0 = BM25, 1 = DPH. qe: 0 = none, 1 = Bo1, 2 = KL, 3 = RM3.
// Returns number of results written (<= k).
int lex_search(void* h, const char* query, int k, int model, double k1,
               double b, int qe, int fb_docs, int fb_terms, double rm3_lambda,
               int32_t* out_ids, double* out_scores) {
  Index& ix = *static_cast<Index*>(h);
  if (ix.n_docs() == 0) return 0;
  WeightedQuery q = parse_query(ix, query, false);
  std::vector<double> acc(ix.n_docs(), 0.0);
  score_query(ix, q, model, k1, b, acc);

  if (qe != 0 && fb_docs > 0) {
    std::vector<int32_t> fb(fb_docs);
    std::vector<double> fs(fb_docs);
    int nf = topk_from_acc(acc, fb_docs, fb.data(), fs.data());
    if (nf > 0) {
      q = expand_query(ix, q, fb.data(), nf, fb_terms, qe, rm3_lambda, 2500.0);
      score_query(ix, q, model, k1, b, acc);
    }
  }
  return topk_from_acc(acc, k, out_ids, out_scores);
}

// Score one (query, doc) pair under the given model (teacher scoring path,
// reference get_teacher_scores.py pt.text.scorer parity).
double lex_score_pair(void* h, const char* query, int32_t doc, int model,
                      double k1, double b) {
  Index& ix = *static_cast<Index*>(h);
  if (doc < 0 || doc >= ix.n_docs()) return 0.0;
  WeightedQuery q = parse_query(ix, query, false);
  const double N = ix.n_docs();
  const double avgdl = ix.avgdl();
  double s = 0.0;
  for (const auto& [term, qw] : q) {
    const auto& pl = ix.postings[term];
    auto it = std::lower_bound(
        pl.begin(), pl.end(), doc,
        [](const Posting& p, int32_t d) { return p.doc < d; });
    if (it == pl.end() || it->doc != doc) continue;
    if (model == 0)
      s += qw * bm25_term(it->tf, ix.doc_len[doc], avgdl, pl.size(), N, k1, b);
    else
      s += qw * dph_term(it->tf, ix.doc_len[doc], avgdl, double(ix.cf[term]), N);
  }
  return s;
}

}  // extern "C"
