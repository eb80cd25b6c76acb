// Native runtime components for VeryFastTree-TPU (C ABI, loaded via ctypes).
//
// TPU-native equivalent of the reference's native IO layer: the FASTA parser
// (ref src/Alignment.cpp:270-310), char->code conversion (ref seqsToProfiles,
// NeighbourJoining.tcc:415-457) and sequence dedup hashing (ref
// src/HashTable.h + Uniquify, src/Alignment.cpp:494-526).  Parsing goes
// straight from the file bytes to the int8 code matrix the device profile
// store consumes -- one pass, no Python string churn -- which matters at the
// 1M-taxa / genome-length scale the 1M-taxa benchmark targets.
//
// Build: make -C native   (produces libvft_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

struct ParsedAlignment {
    int64_t n_seqs;
    int64_t n_pos;
    int8_t *codes;       // [n_seqs * n_pos], NOCODE=127 for gaps/unknowns
    char *names;         // concatenated, NUL-separated
    int64_t names_bytes;
    char *error;         // non-NULL on failure
};

static const int8_t NOCODE = 127;

static void build_lut(const char *codes_string, int8_t lut[256]) {
    for (int i = 0; i < 256; i++) lut[i] = NOCODE;
    for (int i = 0; codes_string[i]; i++) {
        lut[(unsigned char)codes_string[i]] = (int8_t)i;
        lut[(unsigned char)tolower(codes_string[i])] = (int8_t)i;
    }
}

// Parse a FASTA file into a code matrix.  nt_mode applies the U->T / N->X
// normalization (ref Alignment.cpp:464-469; X is unknown -> NOCODE anyway).
ParsedAlignment *vft_parse_fasta(const char *path, const char *codes_string,
                                 int quote_names) {
    auto *out = new ParsedAlignment{0, 0, nullptr, nullptr, 0, nullptr};
    FILE *f = fopen(path, "rb");
    if (!f) {
        out->error = strdup("cannot open file");
        return out;
    }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(sz);
    if (sz > 0 && fread(buf.data(), 1, sz, f) != (size_t)sz) {
        fclose(f);
        out->error = strdup("short read");
        return out;
    }
    fclose(f);

    int8_t lut[256];
    build_lut(codes_string, lut);
    bool nt = strlen(codes_string) == 4;
    if (nt) {
        lut[(unsigned char)'U'] = lut[(unsigned char)'T'];
        lut[(unsigned char)'u'] = lut[(unsigned char)'T'];
        lut[(unsigned char)'N'] = NOCODE;
        lut[(unsigned char)'n'] = NOCODE;
    }
    lut[(unsigned char)'-'] = NOCODE;
    lut[(unsigned char)'.'] = NOCODE;

    const char *name_stop = quote_names ? "'\t" : "(),: \t";

    std::string names;
    std::vector<int8_t> codes;
    std::vector<int64_t> seq_starts;  // offsets into codes per sequence
    int64_t n_pos = 0;

    int64_t i = 0;
    if (sz == 0 || buf[0] != '>') {
        out->error = strdup("not a FASTA file");
        return out;
    }
    while (i < sz) {
        if (buf[i] == '>') {
            // header line: truncate at any of name_stop
            int64_t j = i + 1;
            int64_t end = j;
            while (end < sz && buf[end] != '\n' && buf[end] != '\r') end++;
            int64_t stop = end;
            for (int64_t k = j; k < end; k++) {
                if (strchr(name_stop, buf[k])) { stop = k; break; }
            }
            names.append(buf.data() + j, stop - j);
            names.push_back('\0');
            seq_starts.push_back((int64_t)codes.size());
            i = end;
            while (i < sz && (buf[i] == '\n' || buf[i] == '\r')) i++;
        } else {
            while (i < sz && buf[i] != '\n' && buf[i] != '\r' && buf[i] != '>') {
                unsigned char c = buf[i];
                if (c != ' ' && c != '\t') codes.push_back(lut[c]);
                i++;
            }
            while (i < sz && (buf[i] == '\n' || buf[i] == '\r')) i++;
        }
    }
    seq_starts.push_back((int64_t)codes.size());
    int64_t n_seqs = (int64_t)seq_starts.size() - 1;
    for (int64_t s = 0; s < n_seqs; s++) {
        int64_t len = seq_starts[s + 1] - seq_starts[s];
        if (len > n_pos) n_pos = len;
    }
    for (int64_t s = 0; s < n_seqs; s++) {
        int64_t len = seq_starts[s + 1] - seq_starts[s];
        if (len != n_pos) {
            out->error = strdup("ragged alignment: sequences have different lengths");
            return out;
        }
    }
    out->n_seqs = n_seqs;
    out->n_pos = n_pos;
    out->codes = (int8_t *)malloc(codes.size());
    memcpy(out->codes, codes.data(), codes.size());
    out->names = (char *)malloc(names.size());
    memcpy(out->names, names.data(), names.size());
    out->names_bytes = (int64_t)names.size();
    return out;
}

void vft_free_alignment(ParsedAlignment *p) {
    if (!p) return;
    free(p->codes);
    free(p->names);
    free(p->error);
    delete p;
}

// FNV-1a over a code row (the reference hashes raw sequence bytes with
// xxhash, ref HashTable.h:89-116; any strong hash preserves the semantics).
static uint64_t row_hash(const int8_t *row, int64_t n) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t i = 0; i < n; i++) {
        h ^= (unsigned char)row[i];
        h *= 1099511628211ull;
    }
    return h;
}

// Uniquify: for each row, the index of its first identical occurrence
// (ref Uniquify, src/Alignment.cpp:494-526).  first_of[i] == i marks uniques.
void vft_uniquify(const int8_t *codes, int64_t n_seqs, int64_t n_pos,
                  int64_t *first_of) {
    std::unordered_map<uint64_t, std::vector<int64_t>> table;
    table.reserve(n_seqs * 2);
    for (int64_t i = 0; i < n_seqs; i++) {
        const int8_t *row = codes + i * n_pos;
        uint64_t h = row_hash(row, n_pos);
        auto &bucket = table[h];
        int64_t found = -1;
        for (int64_t j : bucket) {
            if (memcmp(row, codes + j * n_pos, n_pos) == 0) { found = j; break; }
        }
        if (found < 0) {
            bucket.push_back(i);
            first_of[i] = i;
        } else {
            first_of[i] = found;
        }
    }
}

}  // extern "C"
