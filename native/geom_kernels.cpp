// Native geometry runtime for DOTs-SOCP-TPU.
//
// Host-side, performance-critical, non-XLA work lives here:
//   * parse_off      -- fast .off mesh parsing (mmap + manual number scan);
//                       the reference parses .off line-by-line in Python
//                       (dot_surface_socp/data/util.py:73-141), which is the
//                       setup bottleneck for multi-MB benchmark meshes.
//   * bfs_partition  -- breadth-first vertex blocking of the mesh for
//                       device-mesh sharding: contiguous blocks keep the
//                       incidence-table reductions local to a shard, and the
//                       returned permutation is applied once on the host.
//   * halo_mark      -- per-partition halo vertex sets (vertices adjacent to
//                       a block but owned by another), for multi-host runs.
//
// Exposed with a plain C ABI consumed through ctypes
// (dots_socp_tpu/geometry/native.py). No Python.h dependency.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// .off parsing
// ---------------------------------------------------------------------------

struct OffMesh {
  int64_t n_vertices;
  int64_t n_faces;
  double *vertices;  // (n_vertices, 3)
  int32_t *faces;    // (n_faces, 3); polygons are fan-triangulated
};

static const char *skip_ws_and_comments(const char *p, const char *end) {
  while (p < end) {
    if (*p == '#') {  // comment to end of line
      while (p < end && *p != '\n') ++p;
    } else if (isspace((unsigned char)*p)) {
      ++p;
    } else {
      break;
    }
  }
  return p;
}

static double parse_double(const char **pp, const char *end) {
  char *out = nullptr;
  double v = strtod(*pp, &out);
  *pp = out ? out : end;
  return v;
}

static int64_t parse_int(const char **pp, const char *end) {
  char *out = nullptr;
  long long v = strtoll(*pp, &out, 10);
  *pp = out ? out : end;
  return (int64_t)v;
}

// Parse an OFF file. Returns 0 on success; fills *mesh (caller frees with
// free_off_mesh). Supports arbitrary convex polygons (fan triangulation,
// matching the reference's triangle-only expectation for 3-gons).
int parse_off(const char *path, OffMesh *mesh) {
  mesh->vertices = nullptr;
  mesh->faces = nullptr;
  mesh->n_vertices = 0;
  mesh->n_faces = 0;

  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return -2;
  }
  const char *base =
      (const char *)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return -3;
  const char *p = base;
  const char *end = base + st.st_size;

  p = skip_ws_and_comments(p, end);
  if (end - p >= 3 && strncmp(p, "OFF", 3) == 0) p += 3;
  p = skip_ws_and_comments(p, end);

  int64_t nv = parse_int(&p, end);
  p = skip_ws_and_comments(p, end);
  int64_t nf = parse_int(&p, end);
  p = skip_ws_and_comments(p, end);
  parse_int(&p, end);  // n_edges, unused

  if (nv <= 0 || nf < 0) {
    munmap((void *)base, st.st_size);
    return -4;
  }

  double *verts = (double *)malloc(sizeof(double) * 3 * nv);
  std::vector<int32_t> tris;
  tris.reserve((size_t)nf * 3);

  for (int64_t i = 0; i < nv; ++i) {
    for (int k = 0; k < 3; ++k) {
      p = skip_ws_and_comments(p, end);
      verts[i * 3 + k] = parse_double(&p, end);
    }
  }
  for (int64_t f = 0; f < nf; ++f) {
    p = skip_ws_and_comments(p, end);
    int64_t deg = parse_int(&p, end);
    if (deg < 3 || p >= end) {
      free(verts);
      munmap((void *)base, st.st_size);
      return -5;
    }
    std::vector<int32_t> poly((size_t)deg);
    for (int64_t k = 0; k < deg; ++k) {
      p = skip_ws_and_comments(p, end);
      poly[(size_t)k] = (int32_t)parse_int(&p, end);
    }
    for (int64_t k = 1; k + 1 < deg; ++k) {  // fan triangulation
      tris.push_back(poly[0]);
      tris.push_back(poly[(size_t)k]);
      tris.push_back(poly[(size_t)k + 1]);
    }
    // Skip optional per-face color: remainder of the line.
    while (p < end && *p != '\n') ++p;
  }
  munmap((void *)base, st.st_size);

  int32_t *faces = (int32_t *)malloc(sizeof(int32_t) * tris.size());
  memcpy(faces, tris.data(), sizeof(int32_t) * tris.size());

  mesh->n_vertices = nv;
  mesh->n_faces = (int64_t)(tris.size() / 3);
  mesh->vertices = verts;
  mesh->faces = faces;
  return 0;
}

void free_off_mesh(OffMesh *mesh) {
  free(mesh->vertices);
  free(mesh->faces);
  mesh->vertices = nullptr;
  mesh->faces = nullptr;
}

// ---------------------------------------------------------------------------
// BFS vertex partitioning (device-mesh blocking)
// ---------------------------------------------------------------------------

// Partition vertices into n_parts contiguous BFS blocks of near-equal size.
// part_out[v] in [0, n_parts); perm_out is a vertex permutation such that
// the vertices of part b occupy a contiguous index range (BFS order inside
// each block keeps neighborhoods close for the incidence gathers).
// Returns 0 on success.
int bfs_partition(int64_t n_vertices, const int32_t *faces, int64_t n_faces,
                  int32_t n_parts, int32_t *part_out, int32_t *perm_out) {
  if (n_parts <= 0) return -1;
  // Build vertex adjacency (CSR) from triangles.
  std::vector<int64_t> deg(n_vertices + 1, 0);
  for (int64_t f = 0; f < n_faces; ++f) {
    for (int a = 0; a < 3; ++a) {
      deg[faces[f * 3 + a] + 1] += 2;
    }
  }
  for (int64_t v = 0; v < n_vertices; ++v) deg[v + 1] += deg[v];
  std::vector<int32_t> adj(deg[n_vertices]);
  std::vector<int64_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t f = 0; f < n_faces; ++f) {
    int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    adj[fill[a]++] = b;
    adj[fill[a]++] = c;
    adj[fill[b]++] = a;
    adj[fill[b]++] = c;
    adj[fill[c]++] = a;
    adj[fill[c]++] = b;
  }

  const int64_t target = (n_vertices + n_parts - 1) / n_parts;
  std::vector<int32_t> order;
  order.reserve(n_vertices);
  std::vector<char> seen(n_vertices, 0);
  std::queue<int32_t> q;
  // Global BFS from vertex 0 (restarting at unvisited vertices for
  // disconnected meshes), then cut the order into equal blocks: adjacent
  // vertices land in the same or neighboring blocks.
  for (int64_t s = 0; s < n_vertices; ++s) {
    if (seen[s]) continue;
    seen[s] = 1;
    q.push((int32_t)s);
    while (!q.empty()) {
      int32_t v = q.front();
      q.pop();
      order.push_back(v);
      for (int64_t e = deg[v]; e < deg[v + 1]; ++e) {
        int32_t w = adj[e];
        if (!seen[w]) {
          seen[w] = 1;
          q.push(w);
        }
      }
    }
  }
  for (int64_t i = 0; i < n_vertices; ++i) {
    int32_t v = order[i];
    int32_t b = (int32_t)(i / target);
    if (b >= n_parts) b = n_parts - 1;
    part_out[v] = b;
    perm_out[i] = v;  // new index i holds old vertex v
  }
  return 0;
}

// Mark halo vertices: out[v] = 1 if v is adjacent (shares a triangle) to a
// vertex of a different partition. Returns the halo count.
int64_t halo_mark(int64_t n_vertices, const int32_t *faces, int64_t n_faces,
                  const int32_t *part, uint8_t *out) {
  memset(out, 0, (size_t)n_vertices);
  for (int64_t f = 0; f < n_faces; ++f) {
    int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    if (part[a] != part[b] || part[b] != part[c]) {
      out[a] = out[b] = out[c] = 1;
    }
  }
  int64_t count = 0;
  for (int64_t v = 0; v < n_vertices; ++v) count += out[v];
  return count;
}

}  // extern "C"
