// Native host tiler: bin particles into dense [CAP, TY, TX] slot arrays.
//
// The tiled engine's scene construction (ops/tiled.py::init_tiles) is the
// framework's data-loader: at 4-16M particles the numpy argsort path takes
// seconds; this single pass is memory-speed.  Counterpart of the
// reference's host-side scene generation + buffer upload
// (particle_system.rs:102-161).
//
// Build: make -C gpu_physics_engine_tpu/render/native  (same Makefile as
// the rasterizer).  ABI: plain C via ctypes.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <cstring>

extern "C" {

// positions: N*2 f32 (x, y); radii: N f32.
// out_*: CAP*TY*TX arrays (slot-major), pid filled with -1 by the caller.
// Returns the number of particles dropped (tile overflow).
int64_t bin_particles(const float* __restrict positions,
                      const float* __restrict prev_positions,
                      const float* __restrict radii,
                      const int32_t* __restrict pids,
                      int64_t n, float tile_edge,
                      int32_t cap, int32_t ty_n, int32_t tx_n,
                      float* __restrict out_x, float* __restrict out_y,
                      float* __restrict out_px, float* __restrict out_py,
                      float* __restrict out_r, int32_t* __restrict out_pid,
                      int32_t* __restrict fill /* TY*TX scratch, zeroed */) {
    const int64_t ntiles = (int64_t)ty_n * tx_n;
    int64_t dropped = 0;
    const float inv_t = 1.0f / tile_edge;
    for (int64_t i = 0; i < n; ++i) {
        const float x = positions[2 * i];
        const float y = positions[2 * i + 1];
        int32_t tx = (int32_t)std::floor(x * inv_t) + 1;
        int32_t ty = (int32_t)std::floor(y * inv_t) + 1;
        tx = std::min(std::max(tx, 1), tx_n - 2);
        ty = std::min(std::max(ty, 1), ty_n - 2);
        const int64_t tile = (int64_t)ty * tx_n + tx;
        const int32_t k = fill[tile];
        if (k >= cap) { ++dropped; continue; }
        fill[tile] = k + 1;
        const int64_t slot = (int64_t)k * ntiles + tile;
        out_x[slot] = x;
        out_y[slot] = y;
        out_px[slot] = prev_positions[2 * i];
        out_py[slot] = prev_positions[2 * i + 1];
        out_r[slot] = radii[i];
        out_pid[slot] = pids[i];
    }
    return dropped;
}

}  // extern "C"
