/* Native feature-hash embedding kernel (host side).
 *
 * The device kernels make search fast; at 10M-chunk build scale the *host*
 * becomes the bottleneck — tokenize + hash + accumulate in Python runs
 * ~1M words/s on this box. This C implementation of the HashEmbedder hot
 * loop (same tokenization semantics: ASCII [A-Za-z0-9_]+ words lowercased,
 * CJK codepoints as single tokens, other symbols as single tokens) runs
 * the whole pipeline allocation-free per text.
 *
 * Hashing: FNV-1a 64-bit over the token bytes with a "feat:" domain
 * prefix, reduced mod dim — mirrored exactly by the Python fallback in
 * youtu_rag_tpu/models/embedder.py so both paths produce identical
 * vectors.
 *
 * Built via cffi at first import (gcc -O3); see native/__init__.py.
 */

#include <math.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define FNV_OFFSET 14695981039346656037ULL
#define FNV_PRIME 1099511628211ULL

static uint64_t fnv1a_update(uint64_t h, const unsigned char *data, size_t n) {
    for (size_t i = 0; i < n; i++) {
        h ^= (uint64_t)data[i];
        h *= FNV_PRIME;
    }
    return h;
}

/* hash of "feat:" + token bytes */
static uint64_t feat_hash(const unsigned char *tok, size_t n) {
    static const unsigned char prefix[5] = {'f', 'e', 'a', 't', ':'};
    uint64_t h = fnv1a_update(FNV_OFFSET, prefix, 5);
    return fnv1a_update(h, tok, n);
}

static int is_word_byte(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
           (c >= '0' && c <= '9') || c == '_';
}

/* decode one UTF-8 codepoint; returns bytes consumed (>=1) */
static int utf8_decode(const unsigned char *s, size_t n, uint32_t *cp) {
    unsigned char c = s[0];
    if (c < 0x80) { *cp = c; return 1; }
    if ((c >> 5) == 0x6 && n >= 2) { *cp = ((c & 0x1F) << 6) | (s[1] & 0x3F); return 2; }
    if ((c >> 4) == 0xE && n >= 3) {
        *cp = ((c & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
        return 3;
    }
    if ((c >> 3) == 0x1E && n >= 4) {
        *cp = ((c & 0x07) << 18) | ((s[1] & 0x3F) << 12) | ((s[2] & 0x3F) << 6) | (s[3] & 0x3F);
        return 4;
    }
    *cp = c; /* invalid byte: treat as itself */
    return 1;
}

#define MAX_TOKEN 64
#define TABLE_BITS 12 /* 4096-entry open-addressing tf table per text */
#define TABLE_SIZE (1 << TABLE_BITS)

typedef struct {
    uint64_t hash;
    int count;
} TfEntry;

/* embed one utf-8 text into out[dim]; returns token count */
int hash_embed_one(const char *text, int len, float *out, int dim) {
    TfEntry table[TABLE_SIZE];
    memset(table, 0, sizeof(table));
    const unsigned char *s = (const unsigned char *)text;
    size_t n = (size_t)len;
    size_t i = 0;
    unsigned char tok[MAX_TOKEN];
    int total = 0;

    while (i < n) {
        unsigned char c = s[i];
        size_t tlen = 0;
        if (is_word_byte(c)) {
            while (i < n && is_word_byte(s[i])) {
                if (tlen < MAX_TOKEN) {
                    unsigned char lc = s[i];
                    if (lc >= 'A' && lc <= 'Z') lc += 32;
                    tok[tlen++] = lc;
                }
                i++;
            }
        } else if (c < 0x80) {
            if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v') {
                i++;
                continue;
            }
            tok[tlen++] = c; /* single ASCII symbol token */
            i++;
        } else {
            uint32_t cp;
            int used = utf8_decode(s + i, n - i, &cp);
            /* CJK or any non-ASCII codepoint: single-codepoint token,
             * mirroring the Python tokenizer's per-char handling */
            size_t copy = (size_t)used < MAX_TOKEN ? (size_t)used : MAX_TOKEN;
            memcpy(tok, s + i, copy);
            tlen = copy;
            i += used;
        }
        if (tlen == 0) continue;
        uint64_t h = feat_hash(tok, tlen);
        /* open addressing */
        uint64_t slot = h & (TABLE_SIZE - 1);
        for (int probe = 0; probe < TABLE_SIZE; probe++) {
            TfEntry *e = &table[slot];
            if (e->count == 0) {
                e->hash = h;
                e->count = 1;
                break;
            }
            if (e->hash == h) {
                e->count++;
                break;
            }
            slot = (slot + 1) & (TABLE_SIZE - 1);
        }
        total++;
    }

    for (int d = 0; d < dim; d++) out[d] = 0.0f;
    double sumsq = 0.0;
    for (int t = 0; t < TABLE_SIZE; t++) {
        if (table[t].count == 0) continue;
        int idx = (int)(table[t].hash % (uint64_t)dim);
        float w = 1.0f + logf((float)table[t].count);
        out[idx] += w;
    }
    for (int d = 0; d < dim; d++) sumsq += (double)out[d] * out[d];
    if (sumsq > 0) {
        float inv = (float)(1.0 / sqrt(sumsq));
        for (int d = 0; d < dim; d++) out[d] *= inv;
    }
    return total;
}

/* batch entry point: texts concatenated with explicit offsets */
void hash_embed_batch(const char *buf, const int *offsets, int n_texts, float *out, int dim) {
    for (int t = 0; t < n_texts; t++) {
        int start = offsets[t];
        int end = offsets[t + 1];
        hash_embed_one(buf + start, end - start, out + (size_t)t * dim, dim);
    }
}
