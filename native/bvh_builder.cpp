// Native BVH builder: binned-SAH top-down build over a world-space
// triangle soup, emitted in DFS pre-order with skip links for the
// stackless lockstep device traversal (see goblin_tpu/accel/bvh.py for
// the layout contract, mirrored from the Python reference builder).
//
// C ABI (ctypes):
//   int goblin_build_bvh(const float* v0, const float* v1, const float* v2,
//                        int num_tris, int max_leaf, int n_bins,
//                        float* bounds_out /* (2T,6) */,
//                        int*   meta_out   /* (2T,3) */,
//                        int*   order_out  /* (T,)   */);
// Returns the node count (<= 2T), or -1 on error.
//
// Also exports goblin_morton_order (Morton-code triangle ordering used by
// the cluster-based tracer).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct BuildContext {
    const Vec3* tmin;
    const Vec3* tmax;
    const Vec3* center;
    int max_leaf;
    int n_bins;
    float* bounds_out;  // (cap, 6)
    int* meta_out;      // (cap, 3)
    int* order_out;     // (T,)
    int node_count = 0;
    int order_pos = 0;
    int cap = 0;
};

static inline float half_area(const Vec3& lo, const Vec3& hi) {
    float dx = std::max(hi.x - lo.x, 0.0f);
    float dy = std::max(hi.y - lo.y, 0.0f);
    float dz = std::max(hi.z - lo.z, 0.0f);
    return dx * dy + dy * dz + dz * dx;
}

// Iterative emission with an explicit stack. Each frame owns a range of
// the global index scratch; children partition it in place.
struct Frame {
    int64_t begin, end;  // range in idx[]
    int node_id;         // already-emitted node id (second visit) or -1
};

static void build(BuildContext& ctx, std::vector<int64_t>& idx) {
    struct Item {
        int64_t begin, end;
    };
    // recursion via explicit stack of "emit subtree for [begin,end)";
    // we record (node_id, end) pairs to patch miss links after each
    // subtree completes. A node's miss link = node_count at completion.
    struct Pending {
        int node_id;
        int64_t begin, end;
        bool expanded;
    };
    std::vector<Pending> stack;
    stack.push_back({-1, 0, (int64_t)idx.size(), false});

    while (!stack.empty()) {
        Pending fr = stack.back();
        stack.pop_back();
        if (fr.expanded) {
            // subtree finished: patch miss link
            ctx.meta_out[fr.node_id * 3 + 2] = ctx.node_count;
            continue;
        }
        int64_t n = fr.end - fr.begin;
        int my_id = ctx.node_count++;
        // bounds
        Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
        Vec3 clo = lo, chi = hi;
        for (int64_t i = fr.begin; i < fr.end; ++i) {
            int64_t t = idx[i];
            lo = vmin(lo, ctx.tmin[t]);
            hi = vmax(hi, ctx.tmax[t]);
            clo = vmin(clo, ctx.center[t]);
            chi = vmax(chi, ctx.center[t]);
        }
        float* b = ctx.bounds_out + my_id * 6;
        b[0] = lo.x; b[1] = lo.y; b[2] = lo.z;
        b[3] = hi.x; b[4] = hi.y; b[5] = hi.z;
        int* m = ctx.meta_out + my_id * 3;
        m[0] = 0; m[1] = 0; m[2] = 0;
        // push the patch marker first (runs after children complete)
        stack.push_back({my_id, 0, 0, true});

        if (n <= ctx.max_leaf) {
            m[0] = ctx.order_pos;
            m[1] = (int)n;
            for (int64_t i = fr.begin; i < fr.end; ++i) {
                ctx.order_out[ctx.order_pos++] = (int)idx[i];
            }
            continue;
        }
        // choose split axis = longest centroid extent
        float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
        int axis = 0;
        if (ext[1] > ext[0]) axis = 1;
        if (ext[2] > ext[axis]) axis = 2;
        int64_t mid;
        if (ext[axis] <= 1e-12f) {
            mid = fr.begin + n / 2;
        } else {
            // binned SAH
            const int B = ctx.n_bins;
            float clo_a = (&clo.x)[axis];
            float scale = (float)B * (1.0f - 1e-6f) / ext[axis];
            std::vector<int64_t> counts(B, 0);
            std::vector<Vec3> bin_lo(B, {1e30f, 1e30f, 1e30f});
            std::vector<Vec3> bin_hi(B, {-1e30f, -1e30f, -1e30f});
            for (int64_t i = fr.begin; i < fr.end; ++i) {
                int64_t t = idx[i];
                int bi = (int)(((&ctx.center[t].x)[axis] - clo_a) * scale);
                bi = std::min(std::max(bi, 0), B - 1);
                counts[bi]++;
                bin_lo[bi] = vmin(bin_lo[bi], ctx.tmin[t]);
                bin_hi[bi] = vmax(bin_hi[bi], ctx.tmax[t]);
            }
            // sweep
            std::vector<float> rarea(B);
            Vec3 rl = {1e30f, 1e30f, 1e30f}, rh = {-1e30f, -1e30f, -1e30f};
            for (int i = B - 1; i >= 0; --i) {
                rl = vmin(rl, bin_lo[i]);
                rh = vmax(rh, bin_hi[i]);
                rarea[i] = half_area(rl, rh);
            }
            float best_cost = 1e30f;
            int best_bin = -1;
            Vec3 ll = {1e30f, 1e30f, 1e30f}, lh = {-1e30f, -1e30f, -1e30f};
            int64_t lcount = 0;
            for (int i = 0; i < B - 1; ++i) {
                ll = vmin(ll, bin_lo[i]);
                lh = vmax(lh, bin_hi[i]);
                lcount += counts[i];
                int64_t rcount = n - lcount;
                if (lcount == 0 || rcount == 0) continue;
                float cost = half_area(ll, lh) * lcount + rarea[i + 1] * rcount;
                if (cost < best_cost) {
                    best_cost = cost;
                    best_bin = i;
                }
            }
            if (best_bin < 0) {
                // median fallback
                mid = fr.begin + n / 2;
                std::nth_element(
                    idx.begin() + fr.begin, idx.begin() + mid,
                    idx.begin() + fr.end,
                    [&](int64_t a, int64_t c) {
                        return (&ctx.center[a].x)[axis] <
                               (&ctx.center[c].x)[axis];
                    });
            } else {
                auto it = std::partition(
                    idx.begin() + fr.begin, idx.begin() + fr.end,
                    [&](int64_t t) {
                        int bi = (int)(((&ctx.center[t].x)[axis] - clo_a) *
                                       scale);
                        bi = std::min(std::max(bi, 0), B - 1);
                        return bi <= best_bin;
                    });
                mid = it - idx.begin();
                if (mid == fr.begin || mid == fr.end) {
                    mid = fr.begin + n / 2;
                    std::nth_element(
                        idx.begin() + fr.begin, idx.begin() + mid,
                        idx.begin() + fr.end,
                        [&](int64_t a, int64_t c) {
                            return (&ctx.center[a].x)[axis] <
                                   (&ctx.center[c].x)[axis];
                        });
                }
            }
        }
        // pre-order: left child emitted next -> push right FIRST
        stack.push_back({-1, mid, fr.end, false});
        stack.push_back({-1, fr.begin, mid, false});
    }
}

static inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

}  // namespace

extern "C" {

int goblin_build_bvh(const float* v0, const float* v1, const float* v2,
                     int num_tris, int max_leaf, int n_bins,
                     float* bounds_out, int* meta_out, int* order_out) {
    if (num_tris <= 0) return -1;
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);
    std::vector<Vec3> tmin(num_tris), tmax(num_tris), center(num_tris);
    for (int i = 0; i < num_tris; ++i) {
        tmin[i] = vmin(vmin(a[i], b[i]), c[i]);
        tmax[i] = vmax(vmax(a[i], b[i]), c[i]);
        center[i] = {0.5f * (tmin[i].x + tmax[i].x),
                     0.5f * (tmin[i].y + tmax[i].y),
                     0.5f * (tmin[i].z + tmax[i].z)};
    }
    BuildContext ctx;
    ctx.tmin = tmin.data();
    ctx.tmax = tmax.data();
    ctx.center = center.data();
    ctx.max_leaf = std::max(1, max_leaf);
    ctx.n_bins = std::max(2, n_bins);
    ctx.bounds_out = bounds_out;
    ctx.meta_out = meta_out;
    ctx.order_out = order_out;
    std::vector<int64_t> idx(num_tris);
    for (int i = 0; i < num_tris; ++i) idx[i] = i;
    build(ctx, idx);
    return ctx.node_count;
}

// Morton-order the triangles by centroid (for the cluster tracer).
// codes_out: (T,) uint32 morton codes; order_out: (T,) argsort of codes.
void goblin_morton_order(const float* v0, const float* v1, const float* v2,
                         int num_tris, uint32_t* codes_out, int* order_out) {
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);
    Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    std::vector<Vec3> center(num_tris);
    for (int i = 0; i < num_tris; ++i) {
        Vec3 mn = vmin(vmin(a[i], b[i]), c[i]);
        Vec3 mx = vmax(vmax(a[i], b[i]), c[i]);
        center[i] = {0.5f * (mn.x + mx.x), 0.5f * (mn.y + mx.y),
                     0.5f * (mn.z + mx.z)};
        lo = vmin(lo, center[i]);
        hi = vmax(hi, center[i]);
    }
    Vec3 ext = {std::max(hi.x - lo.x, 1e-12f), std::max(hi.y - lo.y, 1e-12f),
                std::max(hi.z - lo.z, 1e-12f)};
    std::vector<int> order(num_tris);
    for (int i = 0; i < num_tris; ++i) {
        float nx = (center[i].x - lo.x) / ext.x;
        float ny = (center[i].y - lo.y) / ext.y;
        float nz = (center[i].z - lo.z) / ext.z;
        uint32_t xi = (uint32_t)std::min(1023.0f, nx * 1024.0f);
        uint32_t yi = (uint32_t)std::min(1023.0f, ny * 1024.0f);
        uint32_t zi = (uint32_t)std::min(1023.0f, nz * 1024.0f);
        codes_out[i] = (expand_bits(xi) << 2) | (expand_bits(yi) << 1) |
                       expand_bits(zi);
        order[i] = i;
    }
    std::stable_sort(order.begin(), order.end(), [&](int x, int y) {
        return codes_out[x] < codes_out[y];
    });
    std::memcpy(order_out, order.data(), num_tris * sizeof(int));
}

}  // extern "C"
