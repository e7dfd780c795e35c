// Native runtime helpers: dataset IO + corpus tokenization.
//
// The reference ships native C for its hot host paths (dataset loaders,
// tokenizer in NeuronDB/src/onnx/neurondb_tokenizer.c, SIMD string work).
// Here the host-side hot paths are benchmark dataset parsing (.fvecs /
// .bvecs / .ivecs, the SIFT/GloVe interchange formats) and BM25 corpus
// tokenization; both are memory-bandwidth-bound C++ loops exposed via a
// C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C neurondb_tpu/native  (produces libndbnative.so)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// .fvecs / .ivecs / .bvecs: sequence of records [int32 dim][dim payload]
// ---------------------------------------------------------------------

// Returns 0 on success; fills n (records) and d (dimension of first rec).
int vecs_info(const char* path, int elem_size, int64_t* n, int32_t* d) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int32_t dim = 0;
    if (std::fread(&dim, sizeof(int32_t), 1, f) != 1 || dim <= 0) {
        std::fclose(f);
        return -2;
    }
    std::fseek(f, 0, SEEK_END);
    int64_t bytes = std::ftell(f);
    int64_t rec = 4 + (int64_t)dim * elem_size;
    std::fclose(f);
    if (bytes % rec != 0) return -3;
    *n = bytes / rec;
    *d = dim;
    return 0;
}

// Reads up to max_n records into out (row-major [max_n, d] float32).
// elem_kind: 0=float32 (fvecs), 1=uint8 (bvecs), 2=int32 (ivecs).
// Returns the number of records read, or <0 on error.
int64_t vecs_read(const char* path, int elem_kind, float* out,
                  int64_t max_n, int32_t d) {
    int elem_size = elem_kind == 0 ? 4 : (elem_kind == 1 ? 1 : 4);
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int64_t count = 0;
    // one staging buffer reused across records
    unsigned char* buf = (unsigned char*)std::malloc((size_t)d * elem_size);
    if (!buf) { std::fclose(f); return -4; }
    while (count < max_n) {
        int32_t dim = 0;
        if (std::fread(&dim, sizeof(int32_t), 1, f) != 1) break;
        if (dim != d) { std::free(buf); std::fclose(f); return -5; }
        if (std::fread(buf, elem_size, (size_t)d, f) != (size_t)d) break;
        float* row = out + count * d;
        if (elem_kind == 0) {
            std::memcpy(row, buf, (size_t)d * 4);
        } else if (elem_kind == 1) {
            for (int32_t i = 0; i < d; ++i) row[i] = (float)buf[i];
        } else {
            const int32_t* ib = (const int32_t*)buf;
            for (int32_t i = 0; i < d; ++i) row[i] = (float)ib[i];
        }
        ++count;
    }
    std::free(buf);
    std::fclose(f);
    return count;
}

// Ranged variant: records are fixed-size (4 + d*elem bytes), so a
// chunked/streaming reader seeks straight to ``start`` — the ingest
// path for corpora that must never be materialized whole
// (MultiHostIVFIndex.from_chunks, DEEP-100M-class).
int64_t vecs_read_range(const char* path, int elem_kind, float* out,
                        int64_t start, int64_t max_n, int32_t d) {
    int elem_size = elem_kind == 0 ? 4 : (elem_kind == 1 ? 1 : 4);
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int64_t rec = 4 + (int64_t)d * elem_size;
    if (std::fseek(f, (long)(start * rec), SEEK_SET) != 0) {
        std::fclose(f);
        return -2;
    }
    int64_t count = 0;
    unsigned char* buf = (unsigned char*)std::malloc((size_t)d * elem_size);
    if (!buf) { std::fclose(f); return -4; }
    while (count < max_n) {
        int32_t dim = 0;
        if (std::fread(&dim, sizeof(int32_t), 1, f) != 1) break;
        if (dim != d) { std::free(buf); std::fclose(f); return -5; }
        if (std::fread(buf, elem_size, (size_t)d, f) != (size_t)d) break;
        float* row = out + count * d;
        if (elem_kind == 0) {
            std::memcpy(row, buf, (size_t)d * 4);
        } else if (elem_kind == 1) {
            for (int32_t i = 0; i < d; ++i) row[i] = (float)buf[i];
        } else {
            const int32_t* ib = (const int32_t*)buf;
            for (int32_t i = 0; i < d; ++i) row[i] = (float)ib[i];
        }
        ++count;
    }
    std::free(buf);
    std::fclose(f);
    return count;
}

// Reads ivecs ground-truth ids as int32 (no float conversion).
int64_t ivecs_read_ids(const char* path, int32_t* out, int64_t max_n,
                       int32_t d) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int64_t count = 0;
    while (count < max_n) {
        int32_t dim = 0;
        if (std::fread(&dim, sizeof(int32_t), 1, f) != 1) break;
        if (dim != d) { std::fclose(f); return -5; }
        if (std::fread(out + count * d, 4, (size_t)d, f) != (size_t)d) break;
        ++count;
    }
    std::fclose(f);
    return count;
}

// ---------------------------------------------------------------------
// corpus tokenization: lowercase [a-z0-9]+ runs -> FNV-1a 64-bit hashes
// ---------------------------------------------------------------------

static inline uint64_t fnv1a(const char* s, int len) {
    uint64_t h = 1469598103934665603ULL;
    for (int i = 0; i < len; ++i) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

// text: concatenated documents; doc_offsets: [n_docs+1] byte offsets.
// Emits per-token (doc_id, token_hash) pairs. Two-phase: call with
// out_hashes == NULL to count tokens; call again with buffers sized
// accordingly. Returns token count.
int64_t tokenize_corpus(const char* text, const int64_t* doc_offsets,
                        int64_t n_docs, int32_t max_token_len,
                        int32_t* out_docs, uint64_t* out_hashes) {
    int64_t n_tok = 0;
    for (int64_t dcc = 0; dcc < n_docs; ++dcc) {
        const char* s = text + doc_offsets[dcc];
        const char* e = text + doc_offsets[dcc + 1];
        const char* p = s;
        while (p < e) {
            while (p < e && !std::isalnum((unsigned char)*p)) ++p;
            const char* tok = p;
            char lowered[64];
            int len = 0;
            while (p < e && std::isalnum((unsigned char)*p)) {
                if (len < 63 && len < max_token_len)
                    lowered[len++] = (char)std::tolower((unsigned char)*p);
                ++p;
            }
            if (len == 0) continue;
            if (out_hashes) {
                out_docs[n_tok] = (int32_t)dcc;
                out_hashes[n_tok] = fnv1a(lowered, len);
            }
            ++n_tok;
        }
    }
    return n_tok;
}

// ---------------------------------------------------------------------
// connected components of a padded adjacency array (HNSW bridge phase)
// ---------------------------------------------------------------------

// nbr: [n, deg] int32 adjacency, -1 (any negative) = padding; edges are
// treated as undirected. Writes per-node root labels (root = smallest
// row id in the component) to labels_out [n]. Returns component count.
// Union-find with union-by-smaller-root + path halving: one linear pass
// over the n*deg edge slots (~32M at 1M x 32) runs ~1 s on one core —
// the host replacement for a ~25 s on-device min-label-propagation pass
// (index/hnsw.py _component_labels) whose scatter-min ran on the TPU
// scalar core.
int64_t graph_components(const int32_t* nbr, int64_t n, int32_t deg,
                         int32_t* labels_out) {
    if (n <= 0) return 0;
    std::vector<int32_t> parent((size_t)n);
    for (int64_t i = 0; i < n; ++i) parent[(size_t)i] = (int32_t)i;
    auto find = [&parent](int32_t x) {
        while (parent[(size_t)x] != x) {
            parent[(size_t)x] = parent[(size_t)parent[(size_t)x]];
            x = parent[(size_t)x];
        }
        return x;
    };
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* row = nbr + i * deg;
        int32_t ri = find((int32_t)i);
        for (int32_t j = 0; j < deg; ++j) {
            int32_t v = row[j];
            if (v < 0 || v >= n) continue;
            int32_t rv = find(v);
            if (rv == ri) continue;
            if (rv < ri) { parent[(size_t)ri] = rv; ri = rv; }
            else parent[(size_t)rv] = ri;
        }
    }
    int64_t n_comp = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t r = find((int32_t)i);
        labels_out[i] = r;
        if (r == (int32_t)i) ++n_comp;
    }
    return n_comp;
}

}  // extern "C"
