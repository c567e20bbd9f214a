// Native text featurizer for the hashed sentence encoder.
//
// The host-side hot loop of index build (tokenize → n-gram → hash → tf) runs
// here instead of per-gram Python hashing. The algorithm is the spec shared
// with the pure-Python fallback in crs_tpu/rag/hashed_features.py — both must
// produce identical (index, weight) sets:
//
//   - lowercase ASCII letters; word chars = [a-z0-9] plus any byte >= 0x80
//     (UTF-8 continuation/lead bytes stay inside words)
//   - grams = unigrams + adjacent-pair bigrams joined with '\x1f'
//   - hash  = FNV-1a 64-bit, bucket = hash % num_features
//   - weight = 1 + ln(count)  (sublinear tf)
//
// Built as a shared library; bound via ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t FNV_OFFSET = 1469598103934665603ULL;
constexpr uint64_t FNV_PRIME = 1099511628211ULL;

inline uint64_t fnv1a(const char* data, int len, uint64_t h = FNV_OFFSET) {
    for (int i = 0; i < len; ++i) {
        h ^= static_cast<uint8_t>(data[i]);
        h *= FNV_PRIME;
    }
    return h;
}

inline bool is_word_byte(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c >= 0x80;
}

// open-addressing map from bucket -> count (small, per call)
struct CountMap {
    static constexpr int CAP = 1 << 13;  // 8192 slots, enough for one chunk
    int64_t keys[CAP];
    int32_t counts[CAP];
    int32_t used_slots[CAP];
    int n_used = 0;

    CountMap() { memset(counts, 0, sizeof(counts)); memset(keys, -1, sizeof(keys)); }

    void add(int64_t key) {
        uint64_t slot = static_cast<uint64_t>(key) * 0x9E3779B97F4A7C15ULL >> 51;
        slot &= (CAP - 1);
        while (true) {
            if (counts[slot] == 0 && keys[slot] == -1) {
                keys[slot] = key;
                counts[slot] = 1;
                used_slots[n_used++] = static_cast<int32_t>(slot);
                return;
            }
            if (keys[slot] == key) {
                counts[slot] += 1;
                return;
            }
            slot = (slot + 1) & (CAP - 1);
        }
    }
};

}  // namespace

namespace {

// Shared tokenizer + gram accumulator. mode bits:
//   bit 0 — add char 3/4-grams per word (with '^'/'$' boundary padding)
//   bit 1 — emit raw counts instead of 1+ln(count)
//   bit 2 — SUPPRESS word uni/bigrams (char-only mode, for split-weighted
//            featurization in the lexical encoder)
// Returns number of pairs written, or -1 on overflow.
int featurize_impl(const char* text, int text_len, long long num_features,
                   int mode, long long* out_idx, float* out_w, int max_out) {
    constexpr int MAX_WORDS = 16384;
    static thread_local char buf[1 << 20];
    if (text_len > static_cast<int>(sizeof(buf)) - 2) text_len = sizeof(buf) - 2;
    int starts[MAX_WORDS], lens[MAX_WORDS];
    int n_words = 0;
    int w_start = -1;
    for (int i = 0; i <= text_len; ++i) {
        char c = (i < text_len) ? text[i] : ' ';
        if (c >= 'A' && c <= 'Z') c = static_cast<char>(c - 'A' + 'a');
        buf[i] = c;
        if (i < text_len && is_word_byte(static_cast<unsigned char>(c))) {
            if (w_start < 0) w_start = i;
        } else if (w_start >= 0) {
            if (n_words < MAX_WORDS) {
                starts[n_words] = w_start;
                lens[n_words] = i - w_start;
                ++n_words;
            }
            w_start = -1;
        }
    }

    CountMap map;
    const uint64_t nf = static_cast<uint64_t>(num_features);
    if (!(mode & 4)) {
        for (int w = 0; w < n_words; ++w) {
            uint64_t h = fnv1a(buf + starts[w], lens[w]);
            map.add(static_cast<int64_t>(h % nf));
        }
        const char SEP = '\x1f';
        for (int w = 0; w + 1 < n_words; ++w) {
            uint64_t h = fnv1a(buf + starts[w], lens[w]);
            h = fnv1a(&SEP, 1, h);
            h = fnv1a(buf + starts[w + 1], lens[w + 1], h);
            map.add(static_cast<int64_t>(h % nf));
        }
    }
    if (mode & 1) {
        // char n-grams over '^' + word + '$', n in {3, 4}, windows only when
        // the padded word is strictly longer than n (spec shared with Python)
        char padded[256 + 2];
        for (int w = 0; w < n_words; ++w) {
            int len = lens[w] < 256 ? lens[w] : 256;
            padded[0] = '^';
            memcpy(padded + 1, buf + starts[w], len);
            padded[len + 1] = '$';
            int plen = len + 2;
            for (int n = 3; n <= 4; ++n) {
                if (plen <= n) continue;
                for (int i = 0; i + n <= plen; ++i) {
                    uint64_t h = fnv1a(padded + i, n);
                    map.add(static_cast<int64_t>(h % nf));
                }
            }
        }
    }

    if (map.n_used > max_out) return -1;
    const bool raw = (mode & 2) != 0;
    for (int i = 0; i < map.n_used; ++i) {
        int slot = map.used_slots[i];
        out_idx[i] = map.keys[slot];
        out_w[i] = raw ? static_cast<float>(map.counts[slot])
                       : 1.0f + logf(static_cast<float>(map.counts[slot]));
    }
    return map.n_used;
}

}  // namespace

extern "C" {

// Mode-parameterized entry points (see featurize_impl for mode bits).
int featurize_ex(const char* text, int text_len, long long num_features,
                 int mode, long long* out_idx, float* out_w, int max_out) {
    return featurize_impl(text, text_len, num_features, mode, out_idx, out_w, max_out);
}

int featurize_batch_ex(const char* blob, const long long* text_offsets, int n_texts,
                       long long num_features, int mode, long long* out_idx,
                       float* out_w, long long* out_offsets, int max_out) {
    int total = 0;
    out_offsets[0] = 0;
    for (int t = 0; t < n_texts; ++t) {
        int len = static_cast<int>(text_offsets[t + 1] - text_offsets[t]);
        int n = featurize_impl(blob + text_offsets[t], len, num_features, mode,
                               out_idx + total, out_w + total, max_out - total);
        if (n < 0) return -1;
        total += n;
        out_offsets[t + 1] = total;
    }
    return total;
}

// Featurize one text. Writes up to max_out (index, weight) pairs; returns the
// number written (or -1 if max_out was too small).
int featurize(const char* text, int text_len, long long num_features,
              long long* out_idx, float* out_w, int max_out) {
    return featurize_impl(text, text_len, num_features, /*mode=*/0,
                          out_idx, out_w, max_out);
}

// Batch variant: texts concatenated, offsets[n_texts+1]; CSR-style output.
// Returns total pairs written or -1 on overflow.
int featurize_batch(const char* blob, const long long* text_offsets, int n_texts,
                    long long num_features, long long* out_idx, float* out_w,
                    long long* out_offsets, int max_out) {
    return featurize_batch_ex(blob, text_offsets, n_texts, num_features,
                              /*mode=*/0, out_idx, out_w, out_offsets, max_out);
}

}  // extern "C"
