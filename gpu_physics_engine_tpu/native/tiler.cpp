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
#include <vector>

extern "C" {

// positions: N*2 f32 (x, y); radii: N f32.
// out_*: CAP*TY*TX arrays (slot-major), pid filled with -1 by the caller.
// Returns the number of particles dropped (tile overflow).
//
// Overflowing particles SPILL to the nearest interior tile with space in a
// second pass (Chebyshev rings outward, row-major scan order per ring,
// spills processed in ascending particle order AFTER all natural
// placements — mirrored exactly by the numpy fallback in ops/tiled.py):
// a spilled particle is just a deferred mover — the pull relocate walks
// it home over the next steps — so a dense random scene starts with every
// particle present instead of silently simulating fewer.  Rings widen as
// far as the grid: placement is guaranteed whenever total slots >= n
// (conservation first — a checkpoint of a gravity-compressed scene can
// legitimately hold more particles near one tile than cap*5x5; far
// spills are stale-but-recoverable, bounded by the relocate sweep and
// the storage-jam watchdog).  A drop can only mean the whole grid is
// full.
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

    auto place = [&](int64_t i, int64_t tile) {
        const int32_t k = fill[tile];
        fill[tile] = k + 1;
        const int64_t slot = (int64_t)k * ntiles + tile;
        out_x[slot] = positions[2 * i];
        out_y[slot] = positions[2 * i + 1];
        out_px[slot] = prev_positions[2 * i];
        out_py[slot] = prev_positions[2 * i + 1];
        out_r[slot] = radii[i];
        out_pid[slot] = pids[i];
    };
    auto home_of = [&](int64_t i, int32_t* oty, int32_t* otx) {
        int32_t tx = (int32_t)std::floor(positions[2 * i] * inv_t) + 1;
        int32_t ty = (int32_t)std::floor(positions[2 * i + 1] * inv_t) + 1;
        *otx = std::min(std::max(tx, 1), tx_n - 2);
        *oty = std::min(std::max(ty, 1), ty_n - 2);
    };

    std::vector<int64_t> overflow;
    for (int64_t i = 0; i < n; ++i) {
        int32_t ty, tx;
        home_of(i, &ty, &tx);
        const int64_t tile = (int64_t)ty * tx_n + tx;
        if (fill[tile] >= cap) { overflow.push_back(i); continue; }
        place(i, tile);
    }
    for (const int64_t i : overflow) {
        int32_t ty, tx;
        home_of(i, &ty, &tx);
        int64_t tile = -1;
        const int32_t max_ring = std::max(ty_n, tx_n);
        for (int32_t ring = 1; ring <= max_ring && tile < 0; ++ring) {
            for (int32_t dy = -ring; dy <= ring && tile < 0; ++dy) {
                for (int32_t dx = -ring; dx <= ring; ++dx) {
                    if (std::max(std::abs(dy), std::abs(dx)) != ring)
                        continue;  // ring boundary only
                    const int32_t sy = ty + dy, sx = tx + dx;
                    if (sy < 1 || sy > ty_n - 2 || sx < 1 || sx > tx_n - 2)
                        continue;
                    const int64_t cand = (int64_t)sy * tx_n + sx;
                    if (fill[cand] < cap) { tile = cand; break; }
                }
            }
        }
        if (tile < 0) { ++dropped; continue; }
        place(i, tile);
    }
    return dropped;
}

}  // extern "C"
