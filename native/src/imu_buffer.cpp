// IMU sample ring buffer with timestamp-range extraction.
//
// Semantic reference: Tracking's IMU queue —
// `Tracking::GrabImuData` pushes under `mMutexImuQueue`
// (/root/reference/src/core/tracking.cpp:1378) and `PreintegrateIMU`
// drains samples in (t_prev_frame, t_cur_frame]
// (tracking.cpp:1384-1500). The reference interleaves this with the
// camera thread; here the buffer is a native single-producer /
// single-consumer ring the Python host feeds from its sensor source and
// drains once per frame into one contiguous array for the jitted
// preintegration scan (imu/preintegration.py).

#include <algorithm>
#include <cstdint>
#include <mutex>
#include <vector>

namespace {

struct Sample {
    double t;
    float acc[3];
    float gyro[3];
};

struct ImuRing {
    std::vector<Sample> buf;
    size_t head = 0;  // next write
    size_t tail = 0;  // oldest valid
    size_t count = 0;
    std::mutex mu;
};

ImuRing* as_ring(void* h) { return static_cast<ImuRing*>(h); }

}  // namespace

extern "C" {

void* imu_ring_create(int32_t capacity) {
    auto* r = new ImuRing();
    r->buf.resize(capacity);
    return r;
}

void imu_ring_destroy(void* h) { delete as_ring(h); }

// Push one sample; overwrites the oldest when full (matches the
// reference's unbounded list in spirit — the host should size the ring
// for worst-case frame gaps).
void imu_ring_push(void* h, double t, const float* acc, const float* gyro) {
    ImuRing* r = as_ring(h);
    std::lock_guard<std::mutex> lock(r->mu);
    Sample& s = r->buf[r->head];
    s.t = t;
    std::copy(acc, acc + 3, s.acc);
    std::copy(gyro, gyro + 3, s.gyro);
    r->head = (r->head + 1) % r->buf.size();
    if (r->count == r->buf.size())
        r->tail = (r->tail + 1) % r->buf.size();
    else
        ++r->count;
}

int32_t imu_ring_size(void* h) {
    ImuRing* r = as_ring(h);
    std::lock_guard<std::mutex> lock(r->mu);
    return (int32_t)r->count;
}

// Extract samples with t0 < t <= t1 into contiguous arrays (times (N,),
// acc (N,3), gyro (N,3)); consumed samples and anything older are
// dropped (PreintegrateIMU's pop-front semantics, tracking.cpp:1406).
// Returns the number written (bounded by max_out).
int32_t imu_ring_drain(void* h, double t0, double t1, int32_t max_out,
                       double* out_t, float* out_acc, float* out_gyro) {
    ImuRing* r = as_ring(h);
    std::lock_guard<std::mutex> lock(r->mu);
    int32_t n = 0;
    while (r->count > 0) {
        Sample& s = r->buf[r->tail];
        if (s.t > t1) break;
        if (s.t > t0 && n < max_out) {
            out_t[n] = s.t;
            std::copy(s.acc, s.acc + 3, out_acc + 3 * n);
            std::copy(s.gyro, s.gyro + 3, out_gyro + 3 * n);
            ++n;
        }
        r->tail = (r->tail + 1) % r->buf.size();
        --r->count;
    }
    return n;
}

}  // extern "C"
