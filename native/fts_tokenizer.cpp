// Native FTS build kernel: tokenize a document batch and assemble the
// CSR inverted index (postings rows/tf, term offsets, doc lengths, vocab).
//
// This is the runtime role the reference fills with the Rust tantivy
// writer (ffi_index_multi_column_docs — SURVEY.md §2.4): ingest-time text
// indexing is CPU-bound native code, while scoring runs on the TPU.
// Tokenization rules mirror myscaledb_tpu/text/analyzer.py exactly:
// tokens are [0-9A-Za-z_]+ (tantivy SimpleTokenizer split); non-ASCII
// bytes are separators; optional lowercasing, length bounds, stopwords.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct BuildResult {
  // CSR postings grouped by term id (first-occurrence order)
  std::vector<int32_t> rows;
  std::vector<float> tf;
  std::vector<int64_t> term_offsets;
  std::vector<float> doc_len;
  // vocabulary: concatenated UTF-8 + offsets
  std::string vocab_buf;
  std::vector<int64_t> vocab_offsets;
  // filtered token-id stream in document order (doc boundaries follow
  // from doc_len): the device-side phrase/adjacency representation
  std::vector<int32_t> stream;
  int64_t total_tokens = 0;
};

inline bool is_token_char(unsigned char c) {
  return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
         (c >= 'a' && c <= 'z') || c == '_';
}

inline bool is_alpha(unsigned char c) {
  return (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
}

}  // namespace

extern "C" {

// Returns an opaque handle (nullptr on error). doc_offsets has n_docs+1
// entries into buf. stop_offsets likewise (n_stop+1) or nullptr.
void* msql_fts_build(const char* buf, const int64_t* doc_offsets,
                     int64_t n_docs, int lower_case, int min_len, int max_len,
                     const char* stop_buf, const int64_t* stop_offsets,
                     int64_t n_stop) {
  auto* out = new (std::nothrow) BuildResult();
  if (!out) return nullptr;

  std::unordered_set<std::string> stop;
  for (int64_t i = 0; i < n_stop; ++i) {
    stop.emplace(stop_buf + stop_offsets[i],
                 static_cast<size_t>(stop_offsets[i + 1] - stop_offsets[i]));
  }

  std::unordered_map<std::string, int32_t> vocab;
  vocab.reserve(1 << 16);
  std::vector<std::string> terms;  // insertion order

  // per-term postings accumulated as (doc, tf) pairs in doc order
  std::vector<std::vector<std::pair<int32_t, float>>> postings;

  std::string tok;
  std::unordered_map<int32_t, int32_t> doc_tf;
  out->doc_len.resize(static_cast<size_t>(n_docs), 0.0f);

  for (int64_t d = 0; d < n_docs; ++d) {
    const char* p = buf + doc_offsets[d];
    const char* end = buf + doc_offsets[d + 1];
    doc_tf.clear();
    int64_t ntok = 0;
    while (p < end) {
      if (!is_token_char(static_cast<unsigned char>(*p))) {
        ++p;
        continue;
      }
      const char* start = p;
      while (p < end && is_token_char(static_cast<unsigned char>(*p))) ++p;
      // no apostrophe suffix: tantivy's SimpleTokenizer splits on any
      // non-alphanumeric, so "history's" -> history, s (analyzer.py)
      size_t len = static_cast<size_t>(p - start);
      if (static_cast<int>(len) < min_len || static_cast<int>(len) > max_len)
        continue;
      tok.assign(start, len);
      if (lower_case) {
        for (auto& c : tok)
          if (c >= 'A' && c <= 'Z') c += 32;
      }
      if (!stop.empty() && stop.count(tok)) continue;
      int32_t id;
      auto it = vocab.find(tok);
      if (it == vocab.end()) {
        id = static_cast<int32_t>(terms.size());
        vocab.emplace(tok, id);
        terms.push_back(tok);
        postings.emplace_back();
      } else {
        id = it->second;
      }
      ++doc_tf[id];
      out->stream.push_back(id);
      ++ntok;
    }
    out->doc_len[static_cast<size_t>(d)] = static_cast<float>(ntok);
    out->total_tokens += ntok;
    for (auto& kv : doc_tf) {
      postings[static_cast<size_t>(kv.first)].emplace_back(
          static_cast<int32_t>(d), static_cast<float>(kv.second));
    }
  }

  // assemble CSR (postings within a term are already in doc order only if
  // doc_tf iteration were ordered — it is not, so sort each term's list)
  const size_t v = terms.size();
  out->term_offsets.resize(v + 1, 0);
  size_t nnz = 0;
  for (size_t t = 0; t < v; ++t) nnz += postings[t].size();
  out->rows.reserve(nnz);
  out->tf.reserve(nnz);
  for (size_t t = 0; t < v; ++t) {
    auto& pl = postings[t];
    // doc ids were appended per-doc in increasing d, so they are sorted
    out->term_offsets[t + 1] =
        out->term_offsets[t] + static_cast<int64_t>(pl.size());
    for (auto& pr : pl) {
      out->rows.push_back(pr.first);
      out->tf.push_back(pr.second);
    }
  }
  out->vocab_offsets.resize(v + 1, 0);
  for (size_t t = 0; t < v; ++t) {
    out->vocab_buf += terms[t];
    out->vocab_offsets[t + 1] = static_cast<int64_t>(out->vocab_buf.size());
  }
  return out;
}

int64_t msql_fts_nnz(void* h) {
  return static_cast<int64_t>(static_cast<BuildResult*>(h)->rows.size());
}
int64_t msql_fts_vocab_size(void* h) {
  return static_cast<int64_t>(
      static_cast<BuildResult*>(h)->vocab_offsets.size() - 1);
}
int64_t msql_fts_vocab_bytes(void* h) {
  return static_cast<int64_t>(static_cast<BuildResult*>(h)->vocab_buf.size());
}
int64_t msql_fts_total_tokens(void* h) {
  return static_cast<BuildResult*>(h)->total_tokens;
}

// Token-id stream in document order (length == total_tokens).
void msql_fts_export_stream(void* h, int32_t* out_stream) {
  auto* r = static_cast<BuildResult*>(h);
  std::memcpy(out_stream, r->stream.data(),
              r->stream.size() * sizeof(int32_t));
}

void msql_fts_export(void* h, int32_t* rows, float* tf, int64_t* term_offsets,
                     float* doc_len, char* vocab_buf, int64_t* vocab_offsets) {
  auto* r = static_cast<BuildResult*>(h);
  std::memcpy(rows, r->rows.data(), r->rows.size() * sizeof(int32_t));
  std::memcpy(tf, r->tf.data(), r->tf.size() * sizeof(float));
  std::memcpy(term_offsets, r->term_offsets.data(),
              r->term_offsets.size() * sizeof(int64_t));
  std::memcpy(doc_len, r->doc_len.data(), r->doc_len.size() * sizeof(float));
  std::memcpy(vocab_buf, r->vocab_buf.data(), r->vocab_buf.size());
  std::memcpy(vocab_offsets, r->vocab_offsets.data(),
              r->vocab_offsets.size() * sizeof(int64_t));
}

void msql_fts_free(void* h) { delete static_cast<BuildResult*>(h); }

}  // extern "C"
