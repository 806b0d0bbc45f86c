// bendy-tpu native CPU oracle tracer.
//
// An independent C++ implementation of the reference algorithm
// (/root/reference/src, see SURVEY.md §3) used as the ground-truth renderer
// for MSE gates: the Rust reference binary cannot be built in this image,
// and the numpy oracle (tests/oracle.py) is too slow for high-spp gates.
// This is a from-scratch re-implementation of the *algorithm*, not a port:
// flat SoA scene arrays in, recursive sampling core matching the reference
// estimator semantics (mixture-PDF NEE, probabilistic volume march, thin
// lens camera, all behavioral quirks documented in SURVEY.md §"Quirks").
//
// Exposed via a C ABI for ctypes (bendy_tpu/native.py). Multithreaded over
// image rows with one deterministic RNG stream per pixel.
//
// Build: native/build.sh  ->  native/liboracle.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct V3 {
  float x = 0, y = 0, z = 0;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float len2(V3 a) { return dot(a, a); }
static inline V3 norm(V3 a) {
  float l = std::sqrt(len2(a));
  return {a.x / l, a.y / l, a.z / l};
}

// Deterministic per-pixel RNG: PCG32.
struct Rng {
  uint64_t state, inc;
  explicit Rng(uint64_t seed, uint64_t seq) {
    state = 0u;
    inc = (seq << 1u) | 1u;
    next();
    state += seed;
    next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = (uint32_t)(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = (uint32_t)(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  float uniform() { return (next() >> 8) * (1.0f / 16777216.0f); }
  float range(float lo, float hi) { return lo + (hi - lo) * uniform(); }
};

constexpr float kInf = 1e30f;
constexpr float kPi = 3.14159265358979323846f;

// Face codes (reference src/tracer/ray.rs:8-15).
enum Face { FRONT = 0, BACK = 1, VOLUME = 2, VOLUME_FRONT = 3, VOLUME_BACK = 4 };
enum MatType { FLAT = 0, DIFFUSE = 1, METALLIC = 2, GLASS = 3, EMISSIVE = 4 };

// SoA scene passed from Python (mirrors bendy_tpu.scene.compiler).
struct Scene {
  int n_spheres = 0, n_rects = 0, n_lights = 0, n_grids = 0;
  const float* sph;       // [Ns][16]: cx cy cz r  mtype alb3  rough ior  emit3  volgrid volsz3 -> 17? packed below
  const float* rct;       // [Nr][17]
  const float* grids;     // [G][D*H*W]
  int gd = 1, gh = 1, gw = 1;
  // root material
  int root_mtype = 0;
  V3 root_albedo, root_emitted;
  // config
  int max_bounces = 8, max_volume_bounces = 32;
  float clip_min = 0.01f, clip_max = 1000.f, volume_step = 0.1f;
  // geodesic masses ([M][4]: cx cy cz rs) + GeoParams (bendy_tpu.geodesic)
  const float* masses = nullptr;
  int n_masses = 0;
  float geo_eta = 0.2f, geo_min_step = 0.02f, geo_max_step = 6.0f;
  float geo_far = 150.0f, geo_growth = 0.02f;
  int geo_max_steps = 256;
};

// Packed strides (keep in sync with bendy_tpu/native.py).
constexpr int SPH_STRIDE = 18;  // c3 r mtype alb3 rough ior emit3 volgrid volsize3 (17) + pad
constexpr int RCT_STRIDE = 32;  // c3 ux3 uy3 n3 hw hh mtype alb3 rough ior emit3 fx3 fy3 (30) + pad
// x/y are the inverse-transposed containment bases, fx/fy the forward
// (M·x̂) sampling bases; all four coincide for rigid transforms.

struct Manifold {
  float t = kInf;
  V3 pos, normal;
  int face = -1;
  int mtype = 0;
  V3 albedo, emitted;
  float rough = 0, ior = 1;
  int vol_grid = -1;
  V3 vol_size;
  int sphere_row = -1;
  V3 bbox_min;
  float bbox_ext = 1;  // sphere AABB edge = 2r
  bool valid = false;
};

struct SphereView {
  V3 c;
  float r;
  int mtype;
  V3 alb;
  float rough, ior;
  V3 emit;
  int vol_grid;
  V3 vol_size;
};
static SphereView sphere_at(const Scene& s, int k) {
  const float* p = s.sph + k * SPH_STRIDE;
  return {{p[0], p[1], p[2]}, p[3], (int)p[4], {p[5], p[6], p[7]}, p[8], p[9],
          {p[10], p[11], p[12]}, (int)p[13], {p[14], p[15], p[16]}};
}
struct RectView {
  V3 c, x, y, z;
  float hw, hh;
  int mtype;
  V3 alb;
  float rough, ior;
  V3 emit;
  V3 fx, fy;  // forward world bases (light sampling under affine)
};
static RectView rect_at(const Scene& s, int k) {
  const float* p = s.rct + k * RCT_STRIDE;
  return {{p[0], p[1], p[2]}, {p[3], p[4], p[5]}, {p[6], p[7], p[8]},
          {p[9], p[10], p[11]}, p[12], p[13], (int)p[14],
          {p[15], p[16], p[17]}, p[18], p[19], {p[20], p[21], p[22]},
          {p[24], p[25], p[26]}, {p[27], p[28], p[29]}};
}
// world-space face area: 4·hw·hh·|fx × fy| (= 4·hw·hh when rigid)
static float rect_area(const RectView& rv) {
  return 4.0f * rv.hw * rv.hh * std::sqrt(len2(cross(rv.fx, rv.fy)));
}

// sphere hit (reference sphere.rs:121-148)
static bool hit_sphere(const SphereView& sv, V3 o, V3 d, float cmin, float cmax, float* t_out) {
  V3 oc = o - sv.c;
  float half_b = dot(oc, d);
  float c = len2(oc) - sv.r * sv.r;
  float disc = half_b * half_b - c;
  if (disc < 0) return false;
  float sq = std::sqrt(disc);
  float t = -half_b - sq;
  if (t < cmin || t > cmax) {
    t = -half_b + sq;
    if (t < cmin || t > cmax) return false;
  }
  *t_out = t;
  return true;
}

// rect hit (reference rect.rs:110-142); returns plane-side sign in *p_out
static bool hit_rect(const RectView& rv, V3 o, V3 d, float cmin, float cmax, float* t_out,
                     float* p_out) {
  float q = dot(d, rv.z);
  if (std::fabs(q) <= 1e-5f) return false;
  float p = dot(rv.c - o, rv.z);
  float t = p / q;
  if (t < cmin || t > cmax) return false;
  V3 local = o + d * t - rv.c;
  float lx = dot(local, rv.x), ly = dot(local, rv.y);
  if (lx * lx > rv.hw * rv.hw || ly * ly > rv.hh * rv.hh) return false;
  *t_out = t;
  *p_out = p;
  return true;
}

static void fill_sphere_manifold(const SphereView& sv, int row, V3 o, V3 d, float t, Manifold* m) {
  m->valid = true;
  m->t = t;
  m->pos = o + d * t;
  V3 n = (m->pos - sv.c) * (1.0f / sv.r);
  bool front = dot(d, n) < 0;
  if (!front) n = n * -1.0f;
  m->normal = n;
  bool has_vol = sv.vol_grid >= 0;
  m->face = has_vol ? (front ? VOLUME_FRONT : VOLUME_BACK) : (front ? FRONT : BACK);
  m->mtype = sv.mtype;
  m->albedo = sv.alb;
  m->rough = sv.rough;
  m->ior = sv.ior;
  m->emitted = sv.emit;
  m->vol_grid = sv.vol_grid;
  m->vol_size = sv.vol_size;
  m->sphere_row = row;
  m->bbox_min = sv.c - V3{sv.r, sv.r, sv.r};
  m->bbox_ext = 2 * sv.r;
}

static void fill_rect_manifold(const RectView& rv, V3 o, V3 d, float t, float p, Manifold* m) {
  m->valid = true;
  m->t = t;
  m->pos = o + d * t;
  bool front = p < 0;
  m->normal = front ? rv.z : rv.z * -1.0f;
  m->face = front ? FRONT : BACK;
  m->mtype = rv.mtype;
  m->albedo = rv.alb;
  m->rough = rv.rough;
  m->ior = rv.ior;
  m->emitted = rv.emit;
  m->vol_grid = -1;
  m->sphere_row = -1;
}

// nearest hit; march>=0 selects the interior treatment for that sphere row
// (reference sphere.rs:150-166, tracer/mod.rs:404-427)
static Manifold nearest(const Scene& s, V3 o, V3 d, float cmin, float cmax, int march_row) {
  Manifold best;
  best.t = kInf;
  for (int k = 0; k < s.n_spheres; k++) {
    SphereView sv = sphere_at(s, k);
    if (k == march_row) {
      V3 end = o + d * cmax;
      if (len2(end - sv.c) <= sv.r * sv.r) {
        if (cmax < best.t) {
          fill_sphere_manifold(sv, k, o, d, cmax, &best);
          best.normal = {0, 0, 0};
          best.face = VOLUME;
        }
        continue;
      }
    }
    float t;
    if (hit_sphere(sv, o, d, cmin, cmax, &t) && t < best.t) fill_sphere_manifold(sv, k, o, d, t, &best);
  }
  for (int k = 0; k < s.n_rects; k++) {
    RectView rv = rect_at(s, k);
    float t, p;
    if (hit_rect(rv, o, d, cmin, cmax, &t, &p) && t < best.t) fill_rect_manifold(rv, o, d, t, p, &best);
  }
  return best;
}

// ---- lights: passed as primitive-row index lists ------------------------
struct Ctx {
  Scene s;
  std::vector<int> light_kind;          // 0 sphere, 1 rect-set
  std::vector<int> light_sphere;        // sphere row
  std::vector<std::vector<int>> light_faces;  // rect rows
};

static V3 unit_sphere_sample(Rng& rng) {
  float r1 = rng.range(0, 2 * kPi), r2 = rng.uniform();
  float s = 2 * std::sqrt(r2 * (1 - r2));
  return {std::cos(r1) * s, std::sin(r1) * s, 1 - 2 * r2};
}
static void frame_of(V3 n, V3* t, V3* b) {
  float sign = n.z >= 0 ? 1.f : -1.f;
  float a = -1.f / (sign + n.z);
  float bb = n.x * n.y * a;
  *t = {1.f + sign * n.x * n.x * a, sign * bb, -sign * n.x};
  *b = {bb, sign + n.y * n.y * a, -n.y};
}
static V3 cosine_sample(Rng& rng, V3 n) {
  float r1 = rng.range(0, 2 * kPi), r2 = rng.uniform();
  V3 t, b;
  frame_of(n, &t, &b);
  float sq = std::sqrt(r2);
  return t * (std::cos(r1) * sq) + b * (std::sin(r1) * sq) + n * std::sqrt(1 - r2);
}
static V3 hemisphere_sample(Rng& rng, V3 n) {  // non-unit (distr.rs:49-58)
  float r1 = rng.range(0, 2 * kPi), r2 = rng.uniform();
  float s = 2 * std::sqrt(r2 * (1 - r2));
  V3 t, b;
  frame_of(n, &t, &b);
  return t * (std::cos(r1) * s) + b * (std::sin(r1) * s) + n * (1 - r2);
}

static V3 reflect(V3 v, V3 n) { return v - n * (2 * dot(v, n)); }
static V3 refract(V3 v, V3 n, float ior) {
  float ct = std::fmin(dot(v * -1.0f, n), 1.0f);
  V3 perp = (n * ct + v) * ior;
  V3 par = n * -std::sqrt(std::fabs(1 - len2(perp)));
  return perp + par;
}
static float fresnel(V3 v, V3 n, float ior) {
  float ct = std::fmin(dot(v * -1.0f, n), 1.0f);
  float r0 = (1 - ior) / (1 + ior);
  r0 *= r0;
  return r0 + (1 - r0) * std::pow(1 - ct, 5.0f);
}

static V3 light_point(const Ctx& c, Rng& rng, int li) {
  if (c.light_kind[li] == 0) {
    SphereView sv = sphere_at(c.s, c.light_sphere[li]);
    return sv.c + unit_sphere_sample(rng) * sv.r;
  }
  const auto& rows = c.light_faces[li];
  double total = 0;
  for (int row : rows) total += rect_area(rect_at(c.s, row));
  double pick = rng.uniform() * total, acc = 0;
  int chosen = rows.back();
  for (int row : rows) {
    acc += rect_area(rect_at(c.s, row));
    if (pick < acc) {
      chosen = row;
      break;
    }
  }
  RectView rv = rect_at(c.s, chosen);
  return rv.c + rv.fx * rng.range(-rv.hw, rv.hw) + rv.fy * rng.range(-rv.hh, rv.hh);
}

static float light_pdf(const Ctx& c, V3 o, V3 d, int li) {
  const Scene& s = c.s;
  if (c.light_kind[li] == 0) {
    SphereView sv = sphere_at(s, c.light_sphere[li]);
    float t;
    if (!hit_sphere(sv, o, d, s.clip_min, s.clip_max, &t)) return 0.f;
    return t * t / (kPi * sv.r * sv.r);
  }
  float bt = kInf, bq = 1, barea = 1;
  for (int row : c.light_faces[li]) {
    RectView rv = rect_at(s, row);
    float t, p;
    if (hit_rect(rv, o, d, s.clip_min, s.clip_max, &t, &p) && t < bt) {
      bt = t;
      bq = dot(d, rv.z);
      barea = rect_area(rv);
    }
  }
  if (bt >= kInf) return 0.f;
  return bt * bt / (barea * std::fabs(bq));
}

static float grid_sample(const Scene& s, int g, V3 size, V3 coord) {
  auto clampf = [](float v, float lo, float hi) { return v < lo ? lo : (v > hi ? hi : v); };
  float cx = clampf(coord.x, 0, 1) * size.x;
  float cy = clampf(coord.y, 0, 1) * size.y;
  float cz = clampf(coord.z, 0, 1) * size.z;
  int x0 = (int)std::floor(cx), y0 = (int)std::floor(cy), z0 = (int)std::floor(cz);
  int x1 = std::min(x0 + 1, (int)size.x), y1 = std::min(y0 + 1, (int)size.y),
      z1 = std::min(z0 + 1, (int)size.z);
  float fx = cx - x0, fy = cy - y0, fz = cz - z0;
  const float* base = s.grids + (size_t)g * s.gd * s.gh * s.gw;
  auto at = [&](int xi, int yi, int zi) { return base[(zi * s.gh + yi) * s.gw + xi]; };
  auto lerp = [](float a, float b, float t) { return a + (b - a) * t; };
  float za = lerp(lerp(at(x0, y0, z0), at(x1, y0, z0), fx), lerp(at(x0, y1, z0), at(x1, y1, z0), fx), fy);
  float zb = lerp(lerp(at(x0, y0, z1), at(x1, y0, z1), fx), lerp(at(x0, y1, z1), at(x1, y1, z1), fx), fy);
  return lerp(za, zb, fz);
}

// ---- geodesic propagation (mirrors bendy_tpu/geodesic.py) ----------------
static V3 geo_accel(const Scene& s, V3 x, V3 d) {
  V3 a = {0, 0, 0};
  for (int k = 0; k < s.n_masses; k++) {
    const float* m = s.masses + k * 4;
    V3 rel = x - V3{m[0], m[1], m[2]};
    float r2 = len2(rel);
    V3 h = cross(rel, d);
    float inv_r = r2 > 0 ? 1.0f / std::sqrt(std::fmax(r2, 1e-20f)) : 0.0f;
    float inv_r5 = inv_r * inv_r * inv_r * inv_r * inv_r;
    a = a + rel * (-1.5f * m[3] * len2(h) * inv_r5);
  }
  return a;
}
static float geo_step(const Scene& s, V3 x, int steps) {
  float r2_min = kInf;
  for (int k = 0; k < s.n_masses; k++) {
    const float* m = s.masses + k * 4;
    r2_min = std::fmin(r2_min, len2(x - V3{m[0], m[1], m[2]}));
  }
  float eta = s.geo_eta * (1.0f + s.geo_growth * steps);
  float ds = eta * std::sqrt(r2_min);
  return std::fmin(std::fmax(ds, s.geo_min_step), s.geo_max_step);
}
static void geo_rk4(const Scene& s, V3& x, V3& d, float ds) {
  float half = ds * 0.5f;
  V3 k1x = d, k1d = geo_accel(s, x, d);
  V3 k2x = d + k1d * half;
  V3 k2d = geo_accel(s, x + k1x * half, k2x);
  V3 k3x = d + k2d * half;
  V3 k3d = geo_accel(s, x + k2x * half, k3x);
  V3 k4x = d + k3d * ds;
  V3 k4d = geo_accel(s, x + k3x * ds, k4x);
  float sixth = ds / 6.0f;
  x = x + (k1x + (k2x + k3x) * 2.0f + k4x) * sixth;
  d = d + (k1d + (k2d + k3d) * 2.0f + k4d) * sixth;
}
static void geo_capture_far(const Scene& s, V3 x, V3 d, bool* captured, bool* far) {
  *captured = false;
  *far = true;
  for (int k = 0; k < s.n_masses; k++) {
    const float* m = s.masses + k * 4;
    V3 rel = x - V3{m[0], m[1], m[2]};
    float r2 = len2(rel);
    *captured = *captured || r2 < m[3] * m[3];
    *far = *far && (r2 > (s.geo_far * m[3]) * (s.geo_far * m[3]) && dot(rel, d) > 0.0f);
  }
}

// recursive sampler, mirroring tracer/mod.rs:322-523
static V3 sample(const Ctx& c, Rng& rng, V3 o, V3 d, int bounce, int geo_steps = 0);

static V3 sample_root(const Ctx& c) {
  const Scene& s = c.s;
  if (s.root_mtype == FLAT || s.root_mtype == EMISSIVE) return s.root_emitted;
  return s.root_albedo;
}

static V3 sample_surface(const Ctx& c, Rng& rng, const Manifold& m, V3 d, int bounce,
                         int geo_steps) {
  const Scene& s = c.s;
  V3 emitted = m.emitted;
  if (m.mtype == FLAT || m.mtype == EMISSIVE) return emitted;
  V3 nd, w;
  if (m.mtype == DIFFUSE) {
    int li = (int)(rng.uniform() * c.light_kind.size());
    if (li >= (int)c.light_kind.size()) li = (int)c.light_kind.size() - 1;
    bool pick_light = rng.uniform() < 0.5f;
    if (pick_light)
      nd = norm(light_point(c, rng, li) - m.pos);
    else
      nd = cosine_sample(rng, m.normal);
    float pdf_cos = dot(m.normal, nd) / kPi;
    float pdf = 0.5f * (pdf_cos + light_pdf(c, m.pos, nd, li));
    if (std::fabs(pdf) <= 1e-5f) return {0, 0, 0};
    w = m.albedo * (pdf_cos / pdf);
  } else if (m.mtype == METALLIC) {
    nd = norm(reflect(d, m.normal) + hemisphere_sample(rng, m.normal) * m.rough);
    w = m.albedo;
  } else {  // GLASS
    float ior = (m.face == FRONT || m.face == VOLUME_FRONT) ? 1.0f / m.ior : m.ior;
    float ct = std::fmin(dot(d * -1.0f, m.normal), 1.0f);
    float st = std::sqrt(std::fmax(1 - ct * ct, 0.f));
    V3 base;
    if (ior * st > 1.0f || rng.uniform() < fresnel(d, m.normal, ior))
      base = reflect(d, m.normal);
    else
      base = refract(d, m.normal, ior);
    nd = norm(base + hemisphere_sample(rng, m.normal) * m.rough);
    w = m.albedo;
  }
  V3 rec = sample(c, rng, m.pos, nd, bounce + 1, geo_steps);
  return emitted + w * rec;
}

static V3 sample_volumetric(const Ctx& c, Rng& rng, V3 o, V3 d, int last_row, int bounce,
                            int vbounce, int geo_steps);

static V3 sample_volume(const Ctx& c, Rng& rng, const Manifold& m, V3 d, int bounce, int vbounce,
                        int geo_steps) {
  const Scene& s = c.s;
  V3 coord = {(m.pos.x - m.bbox_min.x) / m.bbox_ext, (m.pos.y - m.bbox_min.y) / m.bbox_ext,
              (m.pos.z - m.bbox_min.z) / m.bbox_ext};
  float density = s.volume_step * grid_sample(s, m.vol_grid, m.vol_size, coord);
  V3 o2 = m.pos, d2 = d, att = {1, 1, 1};
  if (rng.uniform() < density) {
    if (m.face == VOLUME) o2 = o2 - d * (s.volume_step * rng.uniform());
    d2 = unit_sphere_sample(rng);
    att = {0.8f, 0.8f, 0.8f};
  }
  V3 rec;
  if (m.face == VOLUME_BACK)
    rec = sample(c, rng, o2, d2, bounce + 1, geo_steps);
  else
    rec = sample_volumetric(c, rng, o2, d2, m.sphere_row, bounce, vbounce + 1, geo_steps);
  return att * rec;
}

static V3 sample_volumetric(const Ctx& c, Rng& rng, V3 o, V3 d, int last_row, int bounce,
                            int vbounce, int geo_steps) {
  const Scene& s = c.s;
  if (vbounce > s.max_volume_bounces) return {0, 0, 0};
  // horizon capture applies during a march too (a medium enclosing the
  // mass must not let straight march segments tunnel through rs)
  if (s.n_masses > 0) {
    bool captured, far;
    geo_capture_far(s, o, d, &captured, &far);
    if (captured) return {0, 0, 0};
  }
  Manifold m = nearest(s, o, d, 0.f, s.volume_step, last_row);
  if (!m.valid) return sample_root(c);
  if (m.face == FRONT || m.face == BACK) return sample_surface(c, rng, m, d, bounce, geo_steps);
  if (m.vol_grid < 0) return {0, 0, 0};
  return sample_volume(c, rng, m, d, bounce, vbounce, geo_steps);
}

static V3 dispatch(const Ctx& c, Rng& rng, const Manifold& m, V3 d, int bounce, int geo_steps) {
  if (m.face == FRONT || m.face == BACK) return sample_surface(c, rng, m, d, bounce, geo_steps);
  if (m.vol_grid < 0) return {0, 0, 0};
  return sample_volume(c, rng, m, d, bounce, 0, geo_steps);
}

static V3 sample(const Ctx& c, Rng& rng, V3 o, V3 d, int bounce, int geo_steps) {
  const Scene& s = c.s;
  if (bounce > s.max_bounces) return {0, 0, 0};
  if (s.n_masses == 0) {
    Manifold m = nearest(s, o, d, s.clip_min, s.clip_max, -1);
    if (!m.valid) return sample_root(c);
    return dispatch(c, rng, m, d, bounce, 0);
  }
  // curved space (mirrors the wavefront's geodesic mode): RK4 chord
  // stepping with a straight trace along each chord; far receding rays
  // switch to an exact full-clip trace; horizon crossings and step-budget
  // exhaustion are swallowed. clip_min applies only to the first segment
  // after a bounce. geo_steps persists across bounces within a path.
  bool fresh = true;
  while (true) {
    bool captured, far;
    geo_capture_far(s, o, d, &captured, &far);
    if (captured || geo_steps > s.geo_max_steps) return {0, 0, 0};
    if (far) {
      Manifold m = nearest(s, o, d, fresh ? s.clip_min : 0.0f, s.clip_max, -1);
      if (!m.valid) return sample_root(c);
      return dispatch(c, rng, m, d, bounce, geo_steps);
    }
    float ds = geo_step(s, o, geo_steps);
    V3 x2 = o, d2 = d;
    geo_rk4(s, x2, d2, ds);
    V3 chord = x2 - o;
    float clen = std::sqrt(len2(chord));
    V3 seg = chord * (1.0f / std::fmax(clen, 1e-20f));
    Manifold m = nearest(s, o, seg, fresh ? s.clip_min : 0.0f, clen, -1);
    geo_steps++;
    if (m.valid) return dispatch(c, rng, m, seg, bounce, geo_steps);
    o = x2;
    d = d2;
    fresh = false;
  }
}

}  // namespace

extern "C" {

// Render `spp` samples/pixel into out[h][w][3] (linear mean).
// Camera model mirrors tracer/mod.rs:244-302.
void oracle_render(
    // scene arrays (see bendy_tpu/native.py for packing)
    const float* spheres, int n_spheres,
    const float* rects, int n_rects,
    const int* light_kind, const int* light_sphere,
    const int* light_face_rows, const int* light_face_counts, int n_lights,
    const float* grids, int n_grids, int gd, int gh, int gw,
    int root_mtype, const float* root_albedo, const float* root_emitted,
    // geodesic masses ([M][4]: cx cy cz rs) + GeoParams
    const float* masses, int n_masses,
    float geo_eta, float geo_min_step, float geo_max_step, float geo_far,
    float geo_growth, int geo_max_steps,
    // config
    int max_bounces, int max_volume_bounces,
    float clip_min, float clip_max, float volume_step,
    // camera
    float sensor, float focal, float aspect, float fstop, float focus,
    const float* cam_rot,  // row-major 3x3
    const float* cam_trans,
    // film
    int width, int height, int spp, int subsample, uint64_t seed,
    float* out) {
  Ctx ctx;
  ctx.s.sph = spheres;
  ctx.s.n_spheres = n_spheres;
  ctx.s.rct = rects;
  ctx.s.n_rects = n_rects;
  ctx.s.grids = grids;
  ctx.s.n_grids = n_grids;
  ctx.s.gd = gd;
  ctx.s.gh = gh;
  ctx.s.gw = gw;
  ctx.s.root_mtype = root_mtype;
  ctx.s.root_albedo = {root_albedo[0], root_albedo[1], root_albedo[2]};
  ctx.s.root_emitted = {root_emitted[0], root_emitted[1], root_emitted[2]};
  ctx.s.masses = masses;
  ctx.s.n_masses = n_masses;
  ctx.s.geo_eta = geo_eta;
  ctx.s.geo_min_step = geo_min_step;
  ctx.s.geo_max_step = geo_max_step;
  ctx.s.geo_far = geo_far;
  ctx.s.geo_growth = geo_growth;
  ctx.s.geo_max_steps = geo_max_steps;
  ctx.s.max_bounces = max_bounces;
  ctx.s.max_volume_bounces = max_volume_bounces;
  ctx.s.clip_min = clip_min;
  ctx.s.clip_max = clip_max;
  ctx.s.volume_step = volume_step;
  int off = 0;
  for (int i = 0; i < n_lights; i++) {
    ctx.light_kind.push_back(light_kind[i]);
    ctx.light_sphere.push_back(light_sphere[i]);
    std::vector<int> rows;
    for (int f = 0; f < light_face_counts[i]; f++) rows.push_back(light_face_rows[off + f]);
    off += light_face_counts[i];
    ctx.light_faces.push_back(rows);
  }

  float yfov = 2.0f * std::atan2(sensor, 2.0f * focal);
  float xfov = yfov * aspect;
  float pw = 2.0f / width, ph = 2.0f / height;
  int n = subsample < 1 ? 1 : subsample;

  auto render_rows = [&](int y_begin, int y_end) {
    for (int y = y_begin; y < y_end; y++) {
      for (int x = 0; x < width; x++) {
        Rng rng(seed, (uint64_t)y * width + x);
        V3 acc = {0, 0, 0};
        for (int sidx = 0; sidx < spp; sidx++) {
          for (int j = 0; j < n; j++)
            for (int i = 0; i < n; i++) {
              float u = x * pw - 1 + (i / (float)n) * pw + rng.range(-0.5f, 0.5f) * pw / n;
              float v = y * ph - 1 + (j / (float)n) * ph + rng.range(-0.5f, 0.5f) * ph / n;
              float yr = xfov * 0.5f * -u, xr = yfov * 0.5f * -v;
              V3 dl = {-std::cos(xr) * std::sin(yr), std::sin(xr), -std::cos(xr) * std::cos(yr)};
              V3 d = norm(V3{cam_rot[0] * dl.x + cam_rot[1] * dl.y + cam_rot[2] * dl.z,
                             cam_rot[3] * dl.x + cam_rot[4] * dl.y + cam_rot[5] * dl.z,
                             cam_rot[6] * dl.x + cam_rot[7] * dl.y + cam_rot[8] * dl.z});
              V3 o = {cam_trans[0], cam_trans[1], cam_trans[2]};
              if (focus > 0) {
                float ang = rng.range(0, 2 * kPi), rr = rng.uniform();
                V3 disk = {std::cos(ang) * rr, std::sin(ang) * rr, 0};
                float aperture = 0.5f * focal / fstop;
                V3 df = disk * aperture;
                V3 offv = {cam_rot[0] * df.x + cam_rot[1] * df.y + cam_rot[2] * df.z,
                           cam_rot[3] * df.x + cam_rot[4] * df.y + cam_rot[5] * df.z,
                           cam_rot[6] * df.x + cam_rot[7] * df.y + cam_rot[8] * df.z};
                float frac = focus / std::fabs(dl.z);
                o = o + offv;
                d = norm(d * frac - offv);
              }
              acc = acc + sample(ctx, rng, o, d, 0);
            }
        }
        float scale = 1.0f / (spp * n * n);
        out[(y * (size_t)width + x) * 3 + 0] = acc.x * scale;
        out[(y * (size_t)width + x) * 3 + 1] = acc.y * scale;
        out[(y * (size_t)width + x) * 3 + 2] = acc.z * scale;
      }
    }
  };

  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = hw ? (int)hw : 1;
  if (n_threads > height) n_threads = height;
  if (n_threads <= 1) {
    render_rows(0, height);
  } else {
    std::vector<std::thread> pool;
    int rows_per = (height + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int y0 = t * rows_per, y1 = std::min(height, y0 + rows_per);
      if (y0 < y1) pool.emplace_back(render_rows, y0, y1);
    }
    for (auto& th : pool) th.join();
  }
}

}  // extern "C"
