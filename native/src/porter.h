// porter.h — classic Porter (1980) stemming algorithm, from scratch.
//
// Matches the behavior of Terrier's PorterStemmer term pipeline (Porter's
// own reference implementation, including the two published amendments:
// step-2 "bli"->"ble" and "logi"->"log"), so pools/teachers built over the
// native index reproduce the reference's *stemmed* Terrier/PISA indexes
// (reference utilities/compute_all_bm25.py:26-27 `terrier_stemmed`).
//
// A Python twin lives in pacednegatives_tpu/index/porter.py; the two are
// cross-validated word-for-word in tests/test_porter.py against the sample
// vocabulary from the published algorithm description.

#pragma once

#include <cstring>
#include <string>

namespace porter {

// A consonant is any letter other than a/e/i/o/u, plus 'y' when it follows
// a vowel or starts the word. vowel() is the complement.
inline bool vowel(const std::string& w, int i) {
  switch (w[i]) {
    case 'a': case 'e': case 'i': case 'o': case 'u':
      return true;
    case 'y':
      return i > 0 && !vowel(w, i - 1);
    default:
      return false;
  }
}

// m = number of VC sequences in w[0..j]  ([C](VC)^m[V] decomposition)
inline int measure(const std::string& w, int j) {
  int n = 0, i = 0;
  while (true) {
    if (i > j) return n;
    if (vowel(w, i)) break;
    ++i;
  }
  ++i;
  while (true) {
    while (true) {
      if (i > j) return n;
      if (!vowel(w, i)) break;
      ++i;
    }
    ++i;
    ++n;
    while (true) {
      if (i > j) return n;
      if (vowel(w, i)) break;
      ++i;
    }
    ++i;
  }
}

inline bool has_vowel(const std::string& w, int j) {
  for (int i = 0; i <= j; ++i)
    if (vowel(w, i)) return true;
  return false;
}

// double consonant ending at i
inline bool dbl_cons(const std::string& w, int i) {
  return i >= 1 && w[i] == w[i - 1] && !vowel(w, i);
}

// consonant-vowel-consonant ending at i, final consonant not w/x/y ("*o")
inline bool cvc(const std::string& w, int i) {
  if (i < 2 || vowel(w, i) || !vowel(w, i - 1) || vowel(w, i - 2))
    return false;
  char c = w[i];
  return c != 'w' && c != 'x' && c != 'y';
}

struct Ctx {
  std::string& w;
  int j = -1;  // end index of the stem after a successful ends()

  bool ends(const char* s) {
    int l = int(std::strlen(s));
    int n = int(w.size());
    if (l > n || w.compare(n - l, l, s) != 0) return false;
    j = n - l - 1;
    return true;
  }
  int m() const { return measure(w, j); }
  void setto(const char* s) {
    w.resize(j + 1);
    w += s;
  }
  void truncate() { w.resize(j + 1); }
};

inline void stem(std::string& w) {
  if (w.size() <= 2) return;  // Porter: words of length 1 or 2 unchanged
  Ctx c{w};

  // ---- Step 1a: plurals
  if (c.ends("sses")) {
    c.setto("ss");
  } else if (c.ends("ies")) {
    c.setto("i");
  } else if (c.ends("ss")) {
    // leave as-is
  } else if (c.ends("s")) {
    c.truncate();
  }

  // ---- Step 1b: -ed / -ing
  bool cleanup = false;
  if (c.ends("eed")) {
    if (c.m() > 0) c.setto("ee");
  } else if (c.ends("ed")) {
    if (has_vowel(w, c.j)) {
      c.truncate();
      cleanup = true;
    }
  } else if (c.ends("ing")) {
    if (has_vowel(w, c.j)) {
      c.truncate();
      cleanup = true;
    }
  }
  if (cleanup) {
    if (c.ends("at")) {
      c.setto("ate");
    } else if (c.ends("bl")) {
      c.setto("ble");
    } else if (c.ends("iz")) {
      c.setto("ize");
    } else if (dbl_cons(w, int(w.size()) - 1)) {
      char ch = w.back();
      if (ch != 'l' && ch != 's' && ch != 'z') w.pop_back();
    } else {
      int last = int(w.size()) - 1;
      if (measure(w, last) == 1 && cvc(w, last)) w += 'e';
    }
  }

  // ---- Step 1c: (*v*) y -> i
  if (c.ends("y") && has_vowel(w, c.j)) w.back() = 'i';

  // ---- Step 2 (condition m(stem) > 0)
  {
    static const struct { const char* suf; const char* rep; } rules[] = {
        {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
        {"anci", "ance"},   {"izer", "ize"},    {"bli", "ble"},
        {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
        {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
        {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
        {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
        {"iviti", "ive"},   {"biliti", "ble"},  {"logi", "log"},
    };
    for (const auto& r : rules) {
      if (c.ends(r.suf)) {
        if (c.m() > 0) c.setto(r.rep);
        break;  // first string match decides (Porter switch semantics)
      }
    }
  }

  // ---- Step 3 (condition m(stem) > 0)
  {
    static const struct { const char* suf; const char* rep; } rules[] = {
        {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
        {"ical", "ic"},  {"ful", ""},   {"ness", ""},
    };
    for (const auto& r : rules) {
      if (c.ends(r.suf)) {
        if (c.m() > 0) c.setto(r.rep);
        break;
      }
    }
  }

  // ---- Step 4 (condition m(stem) > 1; "ion" also needs stem ending s/t)
  {
    static const char* sufs[] = {
        "al",  "ance", "ence", "er",  "ic",  "able", "ible", "ant", "ement",
        "ment", "ent", "ion",  "ou",  "ism", "ate",  "iti",  "ous", "ive",
        "ize",
    };
    for (const char* s : sufs) {
      if (c.ends(s)) {
        bool ok = c.m() > 1;
        if (ok && std::strcmp(s, "ion") == 0)
          ok = c.j >= 0 && (w[c.j] == 's' || w[c.j] == 't');
        if (ok) c.truncate();
        break;
      }
    }
  }

  // ---- Step 5a: trailing e
  if (c.ends("e")) {
    int a = c.m();
    if (a > 1 || (a == 1 && !cvc(w, c.j))) c.truncate();
  }
  // ---- Step 5b: -ll -> -l when m > 1
  {
    int last = int(w.size()) - 1;
    if (w[last] == 'l' && dbl_cons(w, last) && measure(w, last) > 1)
      w.pop_back();
  }
}

}  // namespace porter
