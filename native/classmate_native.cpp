// Native host-side kernels for classmate_rag_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-side ingest hot loop the reference left to Python regex + dict ops:
// BM25 tokenization — UTF-8 scan of latin letters (diacritics preserved),
// lowercasing (ASCII + Latin-1 supplement), per-language stopword removal,
// 1-char token drop. Semantics match classmate_rag_tpu/index/lexical.py's
// tokenize() exactly (which mirrors the reference tokenizer,
// rag/retrieval/bm25.py:34-70); a parity test fuzzes the two against each
// other.
//
// C ABI (ctypes-friendly): a tokenizer object holds the stopword sets;
// tokenize_join() writes the kept tokens space-joined into a caller
// buffer — one memcpy out, Python's .split() does the rest at C speed.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_set<std::string> stop_en;
  std::unordered_set<std::string> stop_it;
};

// Is (cp) a letter the reference regex [A-Za-zÀ-ÖØ-öø-ÿ] accepts?
// Works on Unicode code points (we decode UTF-8 below).
inline bool is_token_cp(uint32_t cp) {
  if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) return true;
  if (cp >= 0xC0 && cp <= 0xD6) return true;   // À-Ö
  if (cp >= 0xD8 && cp <= 0xF6) return true;   // Ø-ö
  if (cp >= 0xF8 && cp <= 0xFF) return true;   // ø-ÿ
  return false;
}

// Lowercase within the accepted ranges (ASCII + Latin-1 letters).
inline uint32_t lower_cp(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 0x20;
  if (cp >= 0xC0 && cp <= 0xDE && cp != 0xD7) return cp + 0x20;  // À-Þ minus ×
  return cp;
}

// Append a code point as UTF-8.
inline void append_utf8(std::string& out, uint32_t cp) {
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else {  // all our letters are < 0x800
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Decode the next UTF-8 code point; advances i. Invalid bytes yield 0xFFFD.
inline uint32_t next_cp(const uint8_t* s, int64_t len, int64_t& i) {
  uint8_t b0 = s[i];
  if (b0 < 0x80) { i += 1; return b0; }
  if ((b0 >> 5) == 0x6 && i + 1 < len) {
    uint32_t cp = ((b0 & 0x1F) << 6) | (s[i + 1] & 0x3F);
    i += 2;
    return cp;
  }
  if ((b0 >> 4) == 0xE && i + 2 < len) {
    uint32_t cp = ((b0 & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) |
                  (s[i + 2] & 0x3F);
    i += 3;
    return cp;
  }
  if ((b0 >> 3) == 0x1E && i + 3 < len) {
    uint32_t cp = ((b0 & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                  ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    i += 4;
    return cp;
  }
  i += 1;
  return 0xFFFD;
}

}  // namespace

extern "C" {

void* tokenizer_create(const char** stop_en, int n_en,
                       const char** stop_it, int n_it) {
  auto* tok = new Tokenizer();
  for (int i = 0; i < n_en; ++i) tok->stop_en.insert(stop_en[i]);
  for (int i = 0; i < n_it; ++i) tok->stop_it.insert(stop_it[i]);
  return tok;
}

void tokenizer_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

// Tokenize `text` (UTF-8, text_len bytes). Kept tokens are written
// space-joined into out (capacity out_cap). Returns the number of bytes
// written, or -(needed_bytes) when the buffer is too small.
int64_t tokenize_join(void* handle, const char* text, int64_t text_len,
                      int lang_it, char* out, int64_t out_cap) {
  const auto* tok = static_cast<const Tokenizer*>(handle);
  const auto& stops = lang_it ? tok->stop_it : tok->stop_en;
  const uint8_t* s = reinterpret_cast<const uint8_t*>(text);

  std::string result;
  result.reserve(static_cast<size_t>(text_len));
  std::string current;
  current.reserve(64);

  auto flush = [&]() {
    // Reference semantics: drop 1-char tokens and stopwords.
    if (current.size() > 1 ||
        (current.size() == 1 && false)) {  // 1 byte == 1 char here only for ASCII
      // A 2-byte UTF-8 accented char is still one character; check chars.
      // Count characters quickly: ASCII bytes count 1, lead bytes count 1.
      int chars = 0;
      for (unsigned char c : current)
        if ((c & 0xC0) != 0x80) ++chars;
      if (chars > 1 && stops.find(current) == stops.end()) {
        if (!result.empty()) result.push_back(' ');
        result += current;
      }
    }
    current.clear();
  };

  int64_t i = 0;
  while (i < text_len) {
    uint32_t cp = next_cp(s, text_len, i);
    if (is_token_cp(cp)) {
      append_utf8(current, lower_cp(cp));
    } else if (!current.empty()) {
      flush();
    }
  }
  if (!current.empty()) flush();

  int64_t n = static_cast<int64_t>(result.size());
  if (n > out_cap) return -n;
  std::memcpy(out, result.data(), static_cast<size_t>(n));
  return n;
}

}  // extern "C"
