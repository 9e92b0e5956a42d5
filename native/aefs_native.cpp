// aefs_native: host-side runtime hot paths, C ABI for ctypes.
//
// The reference's host runtime concentrates its CPU cost in three places:
//  - JSON-serializing float arrays for the plot pump (backend.py:15-29,
//    deliberately moved off the event loop at backend.py:49-58),
//  - base64 WAV payloads in file mode (engine.py:75-113),
//  - int16 <-> float32 PCM conversion (engine.py:105).
// This library implements those as tight C++ loops, plus a lock-free SPSC
// block ring buffer for the audio-callback -> engine handoff (the
// reference uses queue.Queue with drop-on-full, core.py:99-106).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libaefs_native.so aefs_native.cpp

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------- JSON ----

// Serialize n float32s as a JSON array fragment "[v0,v1,...]" into out.
// Returns bytes written (excluding NUL). out must hold >= n*16 + 3 bytes
// (n=0 still writes '[', ']' and the NUL — 3 bytes).
// Values are formatted with %.5g — plenty for plot pixels, ~3x smaller
// payloads than repr() doubles.
int64_t json_f32_array(const float* data, int64_t n, char* out) {
    char* p = out;
    *p++ = '[';
    for (int64_t i = 0; i < n; ++i) {
        if (i) *p++ = ',';
        float v = data[i];
        if (!(v > -3.5e38f && v < 3.5e38f)) {  // NaN or +-Inf -> 0 (valid JSON)
            *p++ = '0';
            continue;
        }
        p += snprintf(p, 16, "%.5g", (double)v);
    }
    *p++ = ']';
    *p = '\0';
    return (int64_t)(p - out);
}

// ---------------------------------------------------------------- PCM -----

void f32_to_i16(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)(v * 32767.0f);
    }
}

void i16_to_f32(const int16_t* in, float* out, int64_t n) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * s;
}

// Interleave C channel-major planes (C, N) into (N, C) frames.
void interleave_f32(const float* in, float* out, int64_t channels, int64_t n) {
    for (int64_t c = 0; c < channels; ++c)
        for (int64_t i = 0; i < n; ++i)
            out[i * channels + c] = in[c * n + i];
}

// -------------------------------------------------------------- base64 ----

static const char B64E[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

int64_t b64_encode(const uint8_t* in, int64_t n, char* out) {
    char* p = out;
    int64_t i = 0;
    for (; i + 2 < n; i += 3) {
        uint32_t v = (in[i] << 16) | (in[i + 1] << 8) | in[i + 2];
        *p++ = B64E[(v >> 18) & 63];
        *p++ = B64E[(v >> 12) & 63];
        *p++ = B64E[(v >> 6) & 63];
        *p++ = B64E[v & 63];
    }
    if (i < n) {
        uint32_t v = in[i] << 16;
        bool two = (i + 1 < n);
        if (two) v |= in[i + 1] << 8;
        *p++ = B64E[(v >> 18) & 63];
        *p++ = B64E[(v >> 12) & 63];
        *p++ = two ? B64E[(v >> 6) & 63] : '=';
        *p++ = '=';
    }
    return (int64_t)(p - out);
}

// Decode table built by a function-local static constructor: C++11
// guarantees thread-safe one-time init (the previous plain `static bool
// init` guard was a data race when two threads decoded first uploads
// concurrently — a partially filled table silently drops valid chars).
struct B64Table {
    int8_t t[256];
    B64Table() {
        memset(t, -1, sizeof(t));
        for (int k = 0; k < 64; ++k) t[(uint8_t)B64E[k]] = (int8_t)k;
    }
};

int64_t b64_decode(const char* in, int64_t n, uint8_t* out) {
    static const B64Table TBL;
    const int8_t* T = TBL.t;
    uint8_t* p = out;
    uint32_t acc = 0;
    int bits = 0;
    for (int64_t i = 0; i < n; ++i) {
        int8_t d = T[(uint8_t)in[i]];
        if (d < 0) continue;  // skip '=', whitespace
        acc = (acc << 6) | (uint32_t)d;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            *p++ = (uint8_t)(acc >> bits);
        }
    }
    return (int64_t)(p - out);
}

// ---------------------------------------------- SPSC block ring buffer ----
//
// Fixed-capacity single-producer/single-consumer queue of float32 blocks.
// push from the audio callback never blocks or allocates: on full it drops
// the block and bumps a counter (the reference's put_nowait/queue.Full
// pattern, core.py:103-106, observable where its xrun count never was).

struct SpscRing {
    float* data;
    int64_t block_floats;
    int64_t capacity;  // number of blocks
    std::atomic<int64_t> head;  // consumer position
    std::atomic<int64_t> tail;  // producer position
    std::atomic<int64_t> dropped;
};

// Returns NULL on invalid sizes or allocation failure (capacity 0 would
// make ring_push/ring_pop divide by zero; an overflowing size would
// malloc short and memcpy past it).
SpscRing* ring_create(int64_t block_floats, int64_t capacity) {
    if (block_floats <= 0 || capacity <= 0) return nullptr;
    // Division-based bound check BEFORE the multiply: signed overflow is
    // UB, so a post-multiply `total / capacity != block_floats` test gets
    // optimized away at -O3.  Cap 2^31 floats (8 GB) — far past any ring.
    if (block_floats > ((int64_t)1 << 31) / capacity) return nullptr;
    int64_t total = block_floats * capacity;
    float* data = (float*)malloc(sizeof(float) * (size_t)total);
    if (!data) return nullptr;
    SpscRing* r = new SpscRing();
    r->data = data;
    r->block_floats = block_floats;
    r->capacity = capacity;
    r->head.store(0);
    r->tail.store(0);
    r->dropped.store(0);
    return r;
}

void ring_destroy(SpscRing* r) {
    if (!r) return;
    free(r->data);
    delete r;
}

// Returns 1 on success, 0 if full (block dropped).
int32_t ring_push(SpscRing* r, const float* block) {
    int64_t tail = r->tail.load(std::memory_order_relaxed);
    int64_t head = r->head.load(std::memory_order_acquire);
    if (tail - head >= r->capacity) {
        r->dropped.fetch_add(1, std::memory_order_relaxed);
        return 0;
    }
    memcpy(r->data + (tail % r->capacity) * r->block_floats, block,
           sizeof(float) * r->block_floats);
    r->tail.store(tail + 1, std::memory_order_release);
    return 1;
}

// Pop up to max_blocks into out (contiguous). Returns blocks popped.
int64_t ring_pop(SpscRing* r, float* out, int64_t max_blocks) {
    int64_t head = r->head.load(std::memory_order_relaxed);
    int64_t tail = r->tail.load(std::memory_order_acquire);
    int64_t avail = tail - head;
    if (avail > max_blocks) avail = max_blocks;
    for (int64_t i = 0; i < avail; ++i) {
        memcpy(out + i * r->block_floats,
               r->data + ((head + i) % r->capacity) * r->block_floats,
               sizeof(float) * r->block_floats);
    }
    r->head.store(head + avail, std::memory_order_release);
    return avail;
}

int64_t ring_size(SpscRing* r) {
    return r->tail.load(std::memory_order_acquire) -
           r->head.load(std::memory_order_acquire);
}

int64_t ring_dropped(SpscRing* r) {
    return r->dropped.load(std::memory_order_relaxed);
}

}  // extern "C"
