// Batch text tokenizer for the inverted-index ingest hot loop.
//
// The reference's analyzer stack is native Rust (tantivy Simple +
// LowerCaser + stop filter, inverted_index_writer.rs:347-456); this is the
// C++ analog driven through ctypes. Semantics mirror
// databend_tpu/index/inverted/tokenizer.py exactly:
//   * ASCII [A-Za-z0-9_]+ runs, lowercased
//   * CJK codepoints (CJK Unified Ideographs, Hiragana/Katakana, Hangul
//     Syllables) emitted as single-codepoint tokens (jieba fallback)
//   * optional stopword filter (stopwords passed in, '\n'-joined)
//
// Two-pass C ABI: count then fill, caller allocates numpy buffers.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

inline bool is_word_byte(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
           (c >= '0' && c <= '9') || c == '_';
}

inline unsigned char lower(unsigned char c) {
    return (c >= 'A' && c <= 'Z') ? c + 32 : c;
}

// decode one UTF-8 codepoint at p (n bytes left); returns length consumed
inline int decode_utf8(const unsigned char* p, int64_t n, uint32_t* cp) {
    if (n >= 1 && p[0] < 0x80) { *cp = p[0]; return 1; }
    if (n >= 2 && (p[0] & 0xE0) == 0xC0 && (p[1] & 0xC0) == 0x80) {
        *cp = ((p[0] & 0x1F) << 6) | (p[1] & 0x3F);
        return 2;
    }
    if (n >= 3 && (p[0] & 0xF0) == 0xE0 && (p[1] & 0xC0) == 0x80 &&
        (p[2] & 0xC0) == 0x80) {
        *cp = ((p[0] & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
        return 3;
    }
    if (n >= 4 && (p[0] & 0xF8) == 0xF0 && (p[1] & 0xC0) == 0x80 &&
        (p[2] & 0xC0) == 0x80 && (p[3] & 0xC0) == 0x80) {
        *cp = ((p[0] & 0x07) << 18) | ((p[1] & 0x3F) << 12) |
              ((p[2] & 0x3F) << 6) | (p[3] & 0x3F);
        return 4;
    }
    *cp = 0xFFFD;
    return 1;
}

// matches the python _CJK_RE ranges: [一-鿿぀-ヿ가-힯]
inline bool is_cjk(uint32_t cp) {
    return (cp >= 0x4E00 && cp <= 0x9FFF) ||   // CJK Unified Ideographs
           (cp >= 0x3040 && cp <= 0x30FF) ||   // Hiragana + Katakana
           (cp >= 0xAC00 && cp <= 0xD7AF);     // Hangul Syllables
}

struct StopSet {
    std::unordered_set<std::string> words;
};

// walk one document, invoking emit(token_ptr, len, needs_free) per token.
// ASCII word tokens are lowercased into `scratch`.
template <typename F>
void walk_doc(const unsigned char* p, int64_t n, std::string& scratch, F emit) {
    int64_t i = 0;
    while (i < n) {
        unsigned char c = p[i];
        if (is_word_byte(c)) {
            scratch.clear();
            while (i < n && is_word_byte(p[i])) {
                scratch.push_back((char)lower(p[i]));
                ++i;
            }
            emit(scratch.data(), (int32_t)scratch.size());
            continue;
        }
        if (c < 0x80) {
            ++i;
            continue;
        }
        uint32_t cp;
        int len = decode_utf8(p + i, n - i, &cp);
        if (is_cjk(cp)) {
            emit((const char*)(p + i), (int32_t)len);
        }
        i += len;
    }
}

}  // namespace

extern "C" {

// stopwords: '\n'-joined buffer (may be empty). Returns an opaque handle.
void* dbtpu_stopset_new(const char* data, int64_t n) {
    auto* s = new StopSet();
    const char* end = data + n;
    const char* start = data;
    for (const char* p = data; p <= end; ++p) {
        if (p == end || *p == '\n') {
            if (p > start) s->words.emplace(start, p - start);
            start = p + 1;
        }
    }
    return s;
}

void dbtpu_stopset_free(void* h) { delete (StopSet*)h; }

// Pass 1: count tokens + token bytes for a batch of documents.
// offsets: int64[n_docs+1] byte offsets into data.
int dbtpu_tokenize_count(const char* data, const int64_t* offsets,
                         int64_t n_docs, void* stop_handle,
                         int64_t* out_n_tokens, int64_t* out_n_bytes) {
    StopSet* stop = (StopSet*)stop_handle;
    int64_t n_tokens = 0, n_bytes = 0;
    std::string scratch;
    std::string key;
    for (int64_t d = 0; d < n_docs; ++d) {
        const unsigned char* p = (const unsigned char*)data + offsets[d];
        int64_t n = offsets[d + 1] - offsets[d];
        walk_doc(p, n, scratch, [&](const char* tok, int32_t len) {
            if (stop != nullptr) {
                key.assign(tok, len);
                if (stop->words.count(key)) return;
            }
            n_tokens += 1;
            n_bytes += len;
        });
    }
    *out_n_tokens = n_tokens;
    *out_n_bytes = n_bytes;
    return 0;
}

// Pass 2: fill caller-allocated buffers.
// out_bytes: char[n_bytes]; out_lens: int32[n_tokens];
// out_docs: int32[n_tokens] (document index of each token, in order).
int dbtpu_tokenize_fill(const char* data, const int64_t* offsets,
                        int64_t n_docs, void* stop_handle, char* out_bytes,
                        int32_t* out_lens, int32_t* out_docs) {
    StopSet* stop = (StopSet*)stop_handle;
    std::string scratch;
    std::string key;
    int64_t ti = 0, bi = 0;
    for (int64_t d = 0; d < n_docs; ++d) {
        const unsigned char* p = (const unsigned char*)data + offsets[d];
        int64_t n = offsets[d + 1] - offsets[d];
        walk_doc(p, n, scratch, [&](const char* tok, int32_t len) {
            if (stop != nullptr) {
                key.assign(tok, len);
                if (stop->words.count(key)) return;
            }
            memcpy(out_bytes + bi, tok, len);
            bi += len;
            out_lens[ti] = len;
            out_docs[ti] = (int32_t)d;
            ++ti;
        });
    }
    return 0;
}

// ---------------------------------------------------------------------------
// One-pass analysis with in-C++ vocabulary dedup: the Python side only
// decodes the (small) unique-term dictionary; postings/positions become
// pure numpy over the (token_term_id, token_doc_id) arrays.

struct Analysis {
    std::string term_blob;             // unique terms, concatenated
    std::vector<int32_t> term_lens;    // per unique term
    std::vector<int32_t> tok_term;     // per token: term id (insertion order)
    std::vector<int32_t> tok_doc;      // per token: document index
};

void* dbtpu_analyze(const char* data, const int64_t* offsets, int64_t n_docs,
                    void* stop_handle) {
    StopSet* stop = (StopSet*)stop_handle;
    auto* a = new Analysis();
    std::unordered_map<std::string, int32_t> vocab;
    std::string scratch;
    std::string key;
    for (int64_t d = 0; d < n_docs; ++d) {
        const unsigned char* p = (const unsigned char*)data + offsets[d];
        int64_t n = offsets[d + 1] - offsets[d];
        walk_doc(p, n, scratch, [&](const char* tok, int32_t len) {
            key.assign(tok, len);
            if (stop != nullptr && stop->words.count(key)) return;
            auto it = vocab.find(key);
            int32_t tid;
            if (it == vocab.end()) {
                tid = (int32_t)vocab.size();
                vocab.emplace(key, tid);
                a->term_blob.append(key);
                a->term_lens.push_back(len);
            } else {
                tid = it->second;
            }
            a->tok_term.push_back(tid);
            a->tok_doc.push_back((int32_t)d);
        });
    }
    return a;
}

int64_t dbtpu_analysis_n_tokens(void* h) {
    return (int64_t)((Analysis*)h)->tok_term.size();
}
int64_t dbtpu_analysis_n_terms(void* h) {
    return (int64_t)((Analysis*)h)->term_lens.size();
}
int64_t dbtpu_analysis_term_bytes(void* h) {
    return (int64_t)((Analysis*)h)->term_blob.size();
}

void dbtpu_analysis_fill(void* h, char* term_blob, int32_t* term_lens,
                         int32_t* tok_term, int32_t* tok_doc) {
    Analysis* a = (Analysis*)h;
    memcpy(term_blob, a->term_blob.data(), a->term_blob.size());
    memcpy(term_lens, a->term_lens.data(),
           a->term_lens.size() * sizeof(int32_t));
    memcpy(tok_term, a->tok_term.data(), a->tok_term.size() * sizeof(int32_t));
    memcpy(tok_doc, a->tok_doc.data(), a->tok_doc.size() * sizeof(int32_t));
}

void dbtpu_analysis_free(void* h) { delete (Analysis*)h; }

// ---------------------------------------------------------------------------
// String-column factorization: dense codes per row without decoding —
// the group-by/distinct/join key hot loop (reference: the short-string
// specialized hashtable in src/common/hashtable).

int64_t dbtpu_factorize_strings(const char* data, const int64_t* offsets,
                                int64_t n_rows, int64_t* codes_out) {
    std::unordered_map<std::string, int64_t> seen;
    seen.reserve(1024);
    std::string key;
    for (int64_t i = 0; i < n_rows; ++i) {
        key.assign(data + offsets[i], offsets[i + 1] - offsets[i]);
        auto it = seen.find(key);
        if (it == seen.end()) {
            int64_t code = (int64_t)seen.size();
            seen.emplace(std::move(key), code);
            codes_out[i] = code;
        } else {
            codes_out[i] = it->second;
        }
    }
    return (int64_t)seen.size();
}

// ---------------------------------------------------------------------------
// String-column gather (Column.take over arrow-layout binary data): one
// memcpy per row, no row-length index temporaries — the byte-shuffle half
// of the reference's take kernels (src/query/expression kernels/take).

void dbtpu_take_strings(const char* data, const int64_t* offsets,
                        const int64_t* idx, int64_t n_idx,
                        const int64_t* out_offsets, char* out_data) {
    for (int64_t i = 0; i < n_idx; ++i) {
        const int64_t j = idx[i];
        const int64_t len = offsets[j + 1] - offsets[j];
        if (len)
            memcpy(out_data + out_offsets[i], data + offsets[j],
                   (size_t)len);
    }
}

// ---------------------------------------------------------------------------
// Persistent string hash index: the join build-side hashtable
// (reference: src/common/hashtable short-string specialization). Built
// once per join; probe blocks look up codes without re-hashing the
// build side.

struct StringIndex {
    std::unordered_map<std::string, int64_t> map;
};

void* dbtpu_string_index_new(const char* data, const int64_t* offsets,
                             int64_t n, int64_t* codes_out) {
    auto* si = new StringIndex();
    si->map.reserve((size_t)n * 2);
    std::string key;
    for (int64_t i = 0; i < n; ++i) {
        key.assign(data + offsets[i], offsets[i + 1] - offsets[i]);
        auto it = si->map.find(key);
        if (it == si->map.end()) {
            const int64_t code = (int64_t)si->map.size();
            si->map.emplace(std::move(key), code);
            codes_out[i] = code;
        } else {
            codes_out[i] = it->second;
        }
    }
    return si;
}

int64_t dbtpu_string_index_size(void* h) {
    return (int64_t)((StringIndex*)h)->map.size();
}

// codes_out[i] = build code of probe row i, or -1 when absent.
void dbtpu_string_index_lookup(void* h, const char* data,
                               const int64_t* offsets, int64_t n,
                               int64_t* codes_out) {
    auto* si = (StringIndex*)h;
    std::string key;
    for (int64_t i = 0; i < n; ++i) {
        key.assign(data + offsets[i], offsets[i + 1] - offsets[i]);
        auto it = si->map.find(key);
        codes_out[i] = (it == si->map.end()) ? -1 : it->second;
    }
}

void dbtpu_string_index_free(void* h) { delete (StringIndex*)h; }

// Generic slice copy: row i = data[src_starts[i] : src_starts[i] +
// (out_offsets[i+1]-out_offsets[i])]. Backs vectorized substr/left/right.
void dbtpu_copy_slices(const char* data, const int64_t* src_starts,
                       const int64_t* out_offsets, int64_t n,
                       char* out_data) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t len = out_offsets[i + 1] - out_offsets[i];
        if (len)
            memcpy(out_data + out_offsets[i], data + src_starts[i],
                   (size_t)len);
    }
}

}  // extern "C"
