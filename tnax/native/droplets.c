/* Native droplet-store kernels for the spectrum search's host runtime.
 *
 * The droplet (excitation) machinery is host-side pointer-chasing by
 * nature (reference tnac4o/tnac4o.py:2012-2423); these kernels cover its
 * per-droplet scalar hot loops — Hamming distances, sorted XOR merges,
 * connectivity BFS on adjacency bitsets, bitset overlap — which dominate
 * replay time once the tensor work lives on the accelerator. Pure C with a
 * ctypes binding (tnax/native/__init__.py); NumPy fallbacks remain in
 * tnax/spectrum.py.
 *
 * Bitsets are uint64 words, W words per row, same packing as
 * spectrum.reset_adjacency (np.packbits -> view(uint64)).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static inline int popcount64(uint64_t x) {
    return __builtin_popcountll(x);
}

/* Hamming distance between two sorted droplet shapes, Ising semantics:
 * popcount of per-position XOR (reference _exc_hd_comp,
 * tnac4o/tnac4o.py:2152-2177). */
int64_t tnax_hd_pair_ising(const int64_t *p1, const int64_t *s1, int64_t n1,
                           const int64_t *p2, const int64_t *s2, int64_t n2) {
    int64_t i = 0, j = 0, hd = 0;
    while (i < n1 && j < n2) {
        if (p1[i] == p2[j]) {
            hd += popcount64((uint64_t)(s1[i] ^ s2[j]));
            i++; j++;
        } else if (p1[i] < p2[j]) {
            hd += popcount64((uint64_t)s1[i]); i++;
        } else {
            hd += popcount64((uint64_t)s2[j]); j++;
        }
    }
    for (; i < n1; i++) hd += popcount64((uint64_t)s1[i]);
    for (; j < n2; j++) hd += popcount64((uint64_t)s2[j]);
    return hd;
}

/* RMF semantics: count positions where the states differ (reference
 * _exc_hd_comp, tnac4o/tnac4o.py:2178-2196). */
int64_t tnax_hd_pair_rmf(const int64_t *p1, const int64_t *s1, int64_t n1,
                         const int64_t *p2, const int64_t *s2, int64_t n2) {
    int64_t i = 0, j = 0, hd = 0;
    while (i < n1 && j < n2) {
        if (p1[i] == p2[j]) {
            if (s1[i] != s2[j]) hd++;
            i++; j++;
        } else if (p1[i] < p2[j]) { hd++; i++; }
        else { hd++; j++; }
    }
    if (i < n1) hd += n1 - i;
    else if (j < n2) hd += n2 - j;
    return hd;
}

/* Sorted-merge XOR of two shapes (reference _exc_merge,
 * tnac4o/tnac4o.py:2198-2247). Output buffers must hold n1+n2 entries;
 * returns the merged length. */
int64_t tnax_merge_shapes(const int64_t *p1, const int64_t *s1, int64_t n1,
                          const int64_t *p2, const int64_t *s2, int64_t n2,
                          int64_t *pos_out, int64_t *st_out) {
    int64_t i = 0, j = 0, k = 0;
    while (i < n1 && j < n2) {
        if (p1[i] == p2[j]) {
            int64_t x = s1[i] ^ s2[j];
            if (x) { pos_out[k] = p1[i]; st_out[k] = x; k++; }
            i++; j++;
        } else if (p1[i] < p2[j]) {
            pos_out[k] = p1[i]; st_out[k] = s1[i]; k++; i++;
        } else {
            pos_out[k] = p2[j]; st_out[k] = s2[j]; k++; j++;
        }
    }
    for (; i < n1; i++, k++) { pos_out[k] = p1[i]; st_out[k] = s1[i]; }
    for (; j < n2; j++, k++) { pos_out[k] = p2[j]; st_out[k] = s2[j]; }
    return k;
}

/* Any-bit-in-common test between two W-word bitsets. */
int tnax_overlap(const uint64_t *a, const uint64_t *b, int64_t W) {
    for (int64_t w = 0; w < W; w++)
        if (a[w] & b[w]) return 1;
    return 0;
}

/* OR of selected rows of a (rows x W) bitset matrix into out. */
void tnax_or_rows(const uint64_t *rows, int64_t W, const int64_t *idx,
                  int64_t n, uint64_t *out) {
    memset(out, 0, (size_t)W * sizeof(uint64_t));
    for (int64_t i = 0; i < n; i++) {
        const uint64_t *r = rows + idx[i] * W;
        for (int64_t w = 0; w < W; w++) out[w] |= r[w];
    }
}

/* Is the spin set single-connected on the adjacency bitsets? BFS identical
 * to the reference's wave expansion (_exc_elementary,
 * tnac4o/tnac4o.py:2087-2114). adj_bits is (L x W) row-major. */
int tnax_elementary(const uint64_t *adj_bits, int64_t W,
                    const int64_t *spins, int64_t n) {
    if (n <= 1) return 1;
    uint64_t *rest = (uint64_t *)calloc((size_t)W, sizeof(uint64_t));
    int64_t *queue = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    if (!rest || !queue) { free(rest); free(queue); return -1; }
    /* little-endian packing: spin c <-> bit (c & 63) of word (c >> 6),
     * matching spectrum.reset_adjacency's packbits(bitorder="little") */
    for (int64_t i = 1; i < n; i++)
        rest[spins[i] >> 6] |= 1ULL << (spins[i] & 63);
    int64_t head = 0, tail = 0;
    queue[tail++] = spins[0];
    int64_t remaining = n - 1;
    while (head < tail && remaining > 0) {
        const uint64_t *nb = adj_bits + queue[head++] * W;
        for (int64_t w = 0; w < W; w++) {
            uint64_t hit = nb[w] & rest[w];
            if (!hit) continue;
            rest[w] &= ~hit;
            while (hit) {
                int b = __builtin_ctzll(hit);
                queue[tail++] = (w << 6) + b;
                remaining--;
                hit &= hit - 1;
            }
        }
    }
    free(rest);
    free(queue);
    return remaining == 0;
}

/* Expand the flipped-spin ids of a droplet from a CSR view of the
 * xor2ind tables (reference _exc_xor2ind, tnac4o/tnac4o.py:2081-2085):
 * slot = site_base[dpos[t]] + dstate[t]; spins = concat of
 * values[starts[slot]:starts[slot+1]]. Returns the count. */
int64_t tnax_spins(const int64_t *starts, const int64_t *values,
                   const int64_t *site_base, const int64_t *dpos,
                   const int64_t *dstate, int64_t n, int64_t *out) {
    int64_t k = 0;
    for (int64_t t = 0; t < n; t++) {
        int64_t slot = site_base[dpos[t]] + dstate[t];
        int64_t a = starts[slot], b = starts[slot + 1];
        memcpy(out + k, values + a, (size_t)(b - a) * sizeof(int64_t));
        k += b - a;
    }
    return k;
}

/* Batched elementary test: for each of n droplets (CSR rows of block-site
 * flips, bounds[t]..bounds[t+1] into dpos/dstate), expand the flipped
 * spins via the xor2ind CSR (as tnax_spins) and run the connectivity BFS
 * (as tnax_elementary) — one call per lattice site instead of two ctypes
 * calls per loser. out[t] = 0/1; returns -1 on allocation failure. */
int tnax_elem_batch(const int64_t *starts, const int64_t *values,
                    const int64_t *site_base, const uint64_t *adj_bits,
                    int64_t W, const int64_t *dpos, const int64_t *dstate,
                    const int64_t *bounds, int64_t n, int64_t max_spins,
                    int64_t *out) {
    uint64_t *rest = (uint64_t *)malloc((size_t)W * sizeof(uint64_t));
    int64_t *spins = (int64_t *)malloc((size_t)max_spins * sizeof(int64_t));
    int64_t *queue = (int64_t *)malloc((size_t)max_spins * sizeof(int64_t));
    if (!rest || !spins || !queue) {
        free(rest); free(spins); free(queue); return -1;
    }
    for (int64_t t = 0; t < n; t++) {
        int64_t k = 0;
        for (int64_t u = bounds[t]; u < bounds[t + 1]; u++) {
            int64_t slot = site_base[dpos[u]] + dstate[u];
            int64_t a = starts[slot], b = starts[slot + 1];
            memcpy(spins + k, values + a, (size_t)(b - a) * sizeof(int64_t));
            k += b - a;
        }
        if (k <= 1) { out[t] = 1; continue; }
        memset(rest, 0, (size_t)W * sizeof(uint64_t));
        for (int64_t i = 1; i < k; i++)
            rest[spins[i] >> 6] |= 1ULL << (spins[i] & 63);
        int64_t head = 0, tail = 0;
        queue[tail++] = spins[0];
        int64_t remaining = k - 1;
        while (head < tail && remaining > 0) {
            const uint64_t *nb = adj_bits + queue[head++] * W;
            for (int64_t w = 0; w < W; w++) {
                uint64_t hit = nb[w] & rest[w];
                if (!hit) continue;
                rest[w] &= ~hit;
                while (hit) {
                    int b = __builtin_ctzll(hit);
                    queue[tail++] = (w << 6) + b;
                    remaining--;
                    hit &= hit - 1;
                }
            }
        }
        out[t] = remaining == 0;
    }
    free(rest); free(spins); free(queue);
    return 0;
}
