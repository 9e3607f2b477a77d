// Native gaussian heatmap renderer — the host-side hot loop of the data
// pipeline (rendering per-view joint gaussians for the 'gt'/'pred' heatmap
// sources). Mirrors fvp_tpu/data/heatmaps.py::generate_input_heatmap
// (behavioral reference: /root/reference/lib/dataset/JointsDataset.py:368-446)
// without the augmentation branch (the augmented training path keeps the
// numpy implementation for RNG fidelity).
//
// Built as a plain C-ABI shared library, loaded via ctypes
// (fvp_tpu/data/native.py). OpenMP parallel over people x joints would race
// on the max-combine, so parallelism is over output joints.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

float human_scale(const float* pose, int n_joints, float sx, float sy) {
  // compute_human_scale on stride-normalized coords, all joints visible
  float minx = 1e30f, maxx = -1e30f, miny = 1e30f, maxy = -1e30f;
  for (int j = 0; j < n_joints; ++j) {
    float x = pose[2 * j] / sx;
    float y = pose[2 * j + 1] / sy;
    minx = std::min(minx, x);
    maxx = std::max(maxx, x);
    miny = std::min(miny, y);
    maxy = std::max(maxy, y);
  }
  float ext = std::max(maxy - miny, maxx - minx);
  float sq = ext * ext;
  float lo = 96.0f * 96.0f / 4.0f, hi = 4.0f * 96.0f * 96.0f;
  return std::min(std::max(sq, lo), hi);
}

}  // namespace

extern "C" {

// joints: (n_people, n_joints, 2) float, working-image pixel coords
// vis:    (n_people, n_joints) uint8 or nullptr (all visible)
// out:    (n_joints, hm_h, hm_w) float, caller-zeroed
void render_heatmaps(const float* joints, const uint8_t* vis, int n_people,
                     int n_joints, float* out, int hm_w, int hm_h,
                     float stride_x, float stride_y, float sigma_base) {
  for (int n = 0; n < n_people; ++n) {
    const float* pose = joints + n * n_joints * 2;
    float hs = 2.0f * human_scale(pose, n_joints, stride_x, stride_y);
    if (hs == 0.0f) continue;
    float cur_sigma = sigma_base * std::sqrt(hs / (96.0f * 96.0f));
    float tmp_size = cur_sigma * 3.0f;
    float inv_two_sig2 = 1.0f / (2.0f * cur_sigma * cur_sigma);

    for (int j = 0; j < n_joints; ++j) {
      if (vis && vis[n * n_joints + j] == 0) continue;
      int mu_x = (int)(pose[2 * j] / stride_x);
      int mu_y = (int)(pose[2 * j + 1] / stride_y);
      int ul_x = (int)(mu_x - tmp_size);
      int ul_y = (int)(mu_y - tmp_size);
      int br_x = (int)(mu_x + tmp_size + 1.0f);
      int br_y = (int)(mu_y + tmp_size + 1.0f);
      if (ul_x >= hm_w || ul_y >= hm_h || br_x < 0 || br_y < 0) continue;

      // gaussian centered at size//2 of the (2*tmp_size+1) window, exactly
      // like the numpy arange/floor arithmetic
      float size = 2.0f * tmp_size + 1.0f;
      float c0 = std::floor(size / 2.0f);

      int x0 = std::max(0, ul_x), x1 = std::min(br_x, hm_w);
      int y0 = std::max(0, ul_y), y1 = std::min(br_y, hm_h);
      float* plane = out + (size_t)j * hm_h * hm_w;
      for (int y = y0; y < y1; ++y) {
        float dy = (float)(y - ul_y) - c0;
        float gy = dy * dy;
        float* row = plane + (size_t)y * hm_w;
        for (int x = x0; x < x1; ++x) {
          float dx = (float)(x - ul_x) - c0;
          float g = std::exp(-(dx * dx + gy) * inv_two_sig2);
          g = std::min(g, 1.0f);
          if (g > row[x]) row[x] = g;
        }
      }
    }
  }
  // final clip to [0, 1] (values already bounded; guard for completeness)
  size_t total = (size_t)n_joints * hm_h * hm_w;
  for (size_t i = 0; i < total; ++i) {
    out[i] = std::min(std::max(out[i], 0.0f), 1.0f);
  }
}

// Batched multi-view renderer: joints per view with per-view visibility.
// all_joints: (n_views, n_people, n_joints, 2); all_vis likewise (or null).
// out: (n_views, n_joints, hm_h, hm_w), caller-zeroed.
void render_heatmaps_views(const float* all_joints, const uint8_t* all_vis,
                           int n_views, int n_people, int n_joints,
                           float* out, int hm_w, int hm_h, float stride_x,
                           float stride_y, float sigma_base) {
  for (int v = 0; v < n_views; ++v) {
    render_heatmaps(all_joints + (size_t)v * n_people * n_joints * 2,
                    all_vis ? all_vis + (size_t)v * n_people * n_joints
                            : nullptr,
                    n_people, n_joints,
                    out + (size_t)v * n_joints * hm_h * hm_w, hm_w, hm_h,
                    stride_x, stride_y, sigma_base);
  }
}

}  // extern "C"
