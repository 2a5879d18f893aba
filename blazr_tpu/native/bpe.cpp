// Native BPE merge core — the splintr-equivalent hot loop (SURVEY §2.9
// "splintr" row: PCRE2+JIT BPE in Rust). Pre-tokenization stays in Python
// (the `regex` package is C-backed); this library replaces the per-piece
// merge loop, the actual hot path.
//
// C ABI (ctypes):
//   void*  bpe_new(const uint8_t* blob, uint64_t len);
//   int64_t bpe_encode(void* h, const uint8_t* text, uint64_t len,
//                      uint32_t* out, uint64_t out_cap);
//   void   bpe_free(void* h);
//
// Vocab blob: [u32 n] then n × ([u16 len][bytes][u32 id]), little-endian.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
    std::unordered_map<std::string, uint32_t> ranks;
};

// Encode one pre-tokenized piece: greedy lowest-rank pair merging
// (tiktoken semantics).
void encode_piece(const Bpe& bpe, const uint8_t* data, size_t len,
                  std::vector<uint32_t>& out) {
    if (len == 0) return;
    {   // whole-piece fast path
        std::string whole(reinterpret_cast<const char*>(data), len);
        auto it = bpe.ranks.find(whole);
        if (it != bpe.ranks.end()) {
            out.push_back(it->second);
            return;
        }
    }
    // parts[i] = (start, end) byte ranges
    std::vector<std::pair<size_t, size_t>> parts;
    parts.reserve(len);
    for (size_t i = 0; i < len; ++i) parts.emplace_back(i, i + 1);

    std::string key;
    while (parts.size() > 1) {
        uint32_t best_rank = UINT32_MAX;
        size_t best_idx = SIZE_MAX;
        for (size_t i = 0; i + 1 < parts.size(); ++i) {
            key.assign(reinterpret_cast<const char*>(data) + parts[i].first,
                       parts[i + 1].second - parts[i].first);
            auto it = bpe.ranks.find(key);
            if (it != bpe.ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_idx = i;
            }
        }
        if (best_idx == SIZE_MAX) break;
        parts[best_idx].second = parts[best_idx + 1].second;
        parts.erase(parts.begin() + best_idx + 1);
    }
    for (auto& p : parts) {
        key.assign(reinterpret_cast<const char*>(data) + p.first,
                   p.second - p.first);
        auto it = bpe.ranks.find(key);
        if (it != bpe.ranks.end()) {
            out.push_back(it->second);
        } else {
            // byte fallback
            for (size_t b = p.first; b < p.second; ++b) {
                std::string one(reinterpret_cast<const char*>(data) + b, 1);
                auto bit = bpe.ranks.find(one);
                if (bit != bpe.ranks.end()) out.push_back(bit->second);
            }
        }
    }
}

}  // namespace

extern "C" {

void* bpe_new(const uint8_t* blob, uint64_t len) {
    if (len < 4) return nullptr;
    auto* bpe = new Bpe();
    uint32_t n;
    std::memcpy(&n, blob, 4);
    uint64_t pos = 4;
    bpe->ranks.reserve(n * 2);
    for (uint32_t i = 0; i < n; ++i) {
        if (pos + 2 > len) { delete bpe; return nullptr; }
        uint16_t tlen;
        std::memcpy(&tlen, blob + pos, 2);
        pos += 2;
        if (pos + tlen + 4 > len) { delete bpe; return nullptr; }
        std::string tok(reinterpret_cast<const char*>(blob + pos), tlen);
        pos += tlen;
        uint32_t id;
        std::memcpy(&id, blob + pos, 4);
        pos += 4;
        bpe->ranks.emplace(std::move(tok), id);
    }
    return bpe;
}

// Encode a single piece (caller pre-tokenizes). Returns token count or -1
// if out_cap is too small.
int64_t bpe_encode(void* h, const uint8_t* text, uint64_t len,
                   uint32_t* out_ids, uint64_t out_cap) {
    auto* bpe = static_cast<Bpe*>(h);
    std::vector<uint32_t> out;
    encode_piece(*bpe, text, len, out);
    if (out.size() > out_cap) return -1;
    std::memcpy(out_ids, out.data(), out.size() * sizeof(uint32_t));
    return static_cast<int64_t>(out.size());
}

// Encode many pieces at once: offsets[i]..offsets[i+1] delimit piece i in
// `text`. Amortizes the ctypes boundary over a whole document.
int64_t bpe_encode_batch(void* h, const uint8_t* text,
                         const uint64_t* offsets, uint64_t n_pieces,
                         uint32_t* out_ids, uint64_t out_cap) {
    auto* bpe = static_cast<Bpe*>(h);
    std::vector<uint32_t> out;
    out.reserve(n_pieces * 2);
    for (uint64_t i = 0; i < n_pieces; ++i) {
        encode_piece(*bpe, text + offsets[i], offsets[i + 1] - offsets[i], out);
    }
    if (out.size() > out_cap) return -1;
    std::memcpy(out_ids, out.data(), out.size() * sizeof(uint32_t));
    return static_cast<int64_t>(out.size());
}

void bpe_free(void* h) { delete static_cast<Bpe*>(h); }

}  // extern "C"
