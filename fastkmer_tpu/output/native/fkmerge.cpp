// Native k-way merge of sorted unique (k-mer words, count, bin) tables —
// the host-side analogue of the reference's heap-of-scanners merge
// (priorityQueueWithIndexes, package.scala:642-681), applied where the TPU
// design actually needs a host merge: combining accumulator spills /
// per-chip tables at finalize (pipeline.merge_partials).
//
// Each part is ascending and unique by its W uint32 key words; equal keys
// across parts have their counts summed.  O(N log P) single pass vs
// numpy lexsort's O(N log N) multi-pass + permutation materialization.
//
// Built by output/native/__init__.py (g++ -O3), ctypes ABI:
//   fk_merge(words_ptrs, counts_ptrs, bins_ptrs, sizes, nparts, W,
//            out_words, out_counts, out_bins) -> unique rows written
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

static inline int cmp_key(const uint32_t* a, const uint32_t* b, int64_t W) {
    for (int64_t j = 0; j < W; ++j) {
        if (a[j] < b[j]) return -1;
        if (a[j] > b[j]) return 1;
    }
    return 0;
}

extern "C" int64_t fk_merge(const uint32_t** words, const int64_t** counts,
                            const int32_t** bins, const int64_t* sizes,
                            int64_t nparts, int64_t W, uint32_t* ow,
                            int64_t* oc, int32_t* ob) {
    struct Item {
        const uint32_t* key;
        int32_t part;
    };
    const int64_t Wl = W;
    auto gt = [Wl](const Item& x, const Item& y) {
        int c = cmp_key(x.key, y.key, Wl);
        return c > 0 || (c == 0 && x.part > y.part);
    };
    std::priority_queue<Item, std::vector<Item>, decltype(gt)> pq(gt);
    std::vector<int64_t> pos(nparts, 0);
    for (int64_t p = 0; p < nparts; ++p)
        if (sizes[p] > 0) pq.push({words[p], (int32_t)p});
    int64_t out = -1;
    while (!pq.empty()) {
        Item it = pq.top();
        pq.pop();
        int64_t p = it.part, i = pos[p];
        const uint32_t* key = words[p] + i * W;
        if (out >= 0 && cmp_key(ow + out * W, key, W) == 0) {
            oc[out] += counts[p][i];  // same k-mer from another part
        } else {
            ++out;
            std::memcpy(ow + out * W, key, (size_t)W * 4);
            oc[out] = counts[p][i];
            ob[out] = bins[p][i];
        }
        if (++pos[p] < sizes[p]) pq.push({words[p] + pos[p] * W, (int32_t)p});
    }
    return out + 1;
}
