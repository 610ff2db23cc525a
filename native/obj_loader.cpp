// Native OBJ parser (feature parity with the Python loader in
// goblin_tpu/geometry/mesh.py and the reference parser
// src/GoblinPolygonMesh.cpp:58-262): v/vn/vt records, tri + quad faces
// (quad split 0-1-2 / 0-2-3), negative (relative) indices, the four face
// corner formats, dedup on the (v, t, n) triple.
//
// Two-call C ABI: first call with null outputs to get counts, then with
// allocated buffers to fill them. The parse result is cached between the
// two calls keyed by an opaque handle.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Mesh {
    std::vector<float> pos;   // (V*3)
    std::vector<float> nrm;   // (V*3)
    std::vector<float> uv;    // (V*2)
    std::vector<int> faces;   // (F*3)
    bool has_nrm = false;
    bool has_uv = false;
};

struct Key {
    int v, t, n;
    bool operator==(const Key& o) const {
        return v == o.v && t == o.t && n == o.n;
    }
};
struct KeyHash {
    size_t operator()(const Key& k) const {
        return ((size_t)k.v * 73856093u) ^ ((size_t)(k.t + 1) * 19349663u) ^
               ((size_t)(k.n + 1) * 83492791u);
    }
};

Mesh* g_last = nullptr;

static int resolve(int raw, int count) {
    return raw > 0 ? raw - 1 : count + raw;
}

static bool parse(const char* path, Mesh* m) {
    FILE* f = fopen(path, "r");
    if (!f) return false;
    std::vector<float> vs, vns, vts;
    std::unordered_map<Key, int, KeyHash> dedup;
    char line[4096];
    auto corner = [&](const char* tok) -> int {
        int vi = 0, ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        // formats: v | v/t | v//n | v/t/n
        const char* p = tok;
        vi = atoi(p);
        const char* s1 = strchr(p, '/');
        if (s1) {
            if (s1[1] != '/') {
                ti = atoi(s1 + 1);
                has_t = true;
                const char* s2 = strchr(s1 + 1, '/');
                if (s2) {
                    ni = atoi(s2 + 1);
                    has_n = true;
                }
            } else {
                ni = atoi(s1 + 2);
                has_n = true;
            }
        }
        Key k{resolve(vi, (int)(vs.size() / 3)),
              has_t ? resolve(ti, (int)(vts.size() / 2)) : -1,
              has_n ? resolve(ni, (int)(vns.size() / 3)) : -1};
        auto it = dedup.find(k);
        if (it != dedup.end()) return it->second;
        int id = (int)(m->pos.size() / 3);
        dedup.emplace(k, id);
        m->pos.insert(m->pos.end(), {vs[k.v * 3], vs[k.v * 3 + 1],
                                     vs[k.v * 3 + 2]});
        if (k.t >= 0) {
            m->uv.insert(m->uv.end(), {vts[k.t * 2], vts[k.t * 2 + 1]});
            m->has_uv = true;
        } else {
            m->uv.insert(m->uv.end(), {0.f, 0.f});
        }
        if (k.n >= 0) {
            m->nrm.insert(m->nrm.end(), {vns[k.n * 3], vns[k.n * 3 + 1],
                                         vns[k.n * 3 + 2]});
            m->has_nrm = true;
        } else {
            m->nrm.insert(m->nrm.end(), {0.f, 0.f, 0.f});
        }
        return id;
    };

    while (fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                vs.insert(vs.end(), {x, y, z});
            }
        } else if (line[0] == 'v' && line[1] == 'n') {
            float x, y, z;
            if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                vns.insert(vns.end(), {x, y, z});
            }
        } else if (line[0] == 'v' && line[1] == 't') {
            float x, y;
            if (sscanf(line + 2, "%f %f", &x, &y) == 2) {
                vts.insert(vts.end(), {x, y});
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            char* saveptr = nullptr;
            char* tok = strtok_r(line + 2, " \t\r\n", &saveptr);
            int ids[8];
            int n = 0;
            while (tok && n < 8) {
                ids[n++] = corner(tok);
                tok = strtok_r(nullptr, " \t\r\n", &saveptr);
            }
            if (n >= 3) {
                m->faces.insert(m->faces.end(), {ids[0], ids[1], ids[2]});
            }
            if (n == 4) {
                m->faces.insert(m->faces.end(), {ids[0], ids[2], ids[3]});
            }
        }
    }
    fclose(f);
    return !m->faces.empty();
}

}  // namespace

extern "C" {

// Parse; returns handle (>0) or 0 on failure. Counts via out params.
int64_t goblin_obj_parse(const char* path, int* num_verts, int* num_faces,
                         int* has_normals, int* has_uvs) {
    Mesh* m = new Mesh();
    if (!parse(path, m)) {
        delete m;
        return 0;
    }
    if (g_last) delete g_last;
    g_last = m;
    *num_verts = (int)(m->pos.size() / 3);
    *num_faces = (int)(m->faces.size() / 3);
    *has_normals = m->has_nrm ? 1 : 0;
    *has_uvs = m->has_uv ? 1 : 0;
    return (int64_t)m;
}

void goblin_obj_fill(int64_t handle, float* pos, float* nrm, float* uv,
                     int* faces) {
    Mesh* m = (Mesh*)handle;
    memcpy(pos, m->pos.data(), m->pos.size() * sizeof(float));
    memcpy(nrm, m->nrm.data(), m->nrm.size() * sizeof(float));
    memcpy(uv, m->uv.data(), m->uv.size() * sizeof(float));
    memcpy(faces, m->faces.data(), m->faces.size() * sizeof(int));
    if (m == g_last) g_last = nullptr;
    delete m;
}

}  // extern "C"
