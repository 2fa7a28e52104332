// Native runtime components for hoomd_tpu.
//
// The reference implements its runtime (I/O writers, space-filling-curve
// sorter) in C++ (hoomd/GSDDumpWriter.cc, hoomd/SFCPackUpdater.cc); the
// equivalents here are:
//
//   * an asynchronous frame writer: checkpoint/trajectory blobs are
//     enqueued from Python and written by a background thread so device
//     step loops never stall on disk I/O (the reference writes
//     synchronously from the run loop; async is the deliberate upgrade),
//   * 3D Hilbert-curve encoding for the spatial sorter (the reference's
//     SFCPackUpdater traversal order, SFCPackUpdater.h:38-84) — exact
//     Hilbert order improves on the Morton fallback's locality.
//
// Exposed with a plain C ABI consumed via ctypes (no pybind11 in the
// image).  Build: hoomd_tpu/native/__init__.py invokes g++ on demand.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Hilbert curve: transpose-form algorithm (Skilling 2004, public domain
// technique).  frac: n*3 doubles in [0,1); out: n uint64 Hilbert indices
// on a 2^bits grid per axis (bits <= 21).
// ---------------------------------------------------------------------------
void ht_hilbert3(const double* frac, int64_t n, int bits, uint64_t* out) {
    const uint32_t maxc = (1u << bits) - 1;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t X[3];
        for (int d = 0; d < 3; ++d) {
            double f = frac[i * 3 + d];
            if (f < 0.0) f = 0.0;
            if (f >= 1.0) f = 0.999999999;
            X[d] = (uint32_t)(f * (double)(1u << bits));
            if (X[d] > maxc) X[d] = maxc;
        }
        // inverse undo excess work: convert coordinates to transpose form
        uint32_t M = 1u << (bits - 1), P, Q, t;
        // Inverse undo
        for (Q = M; Q > 1; Q >>= 1) {
            P = Q - 1;
            for (int d = 0; d < 3; ++d) {
                if (X[d] & Q) {
                    X[0] ^= P;  // invert
                } else {        // exchange
                    t = (X[0] ^ X[d]) & P;
                    X[0] ^= t;
                    X[d] ^= t;
                }
            }
        }
        // Gray encode
        for (int d = 1; d < 3; ++d) X[d] ^= X[d - 1];
        t = 0;
        for (Q = M; Q > 1; Q >>= 1)
            if (X[2] & Q) t ^= Q - 1;
        for (int d = 0; d < 3; ++d) X[d] ^= t;
        // interleave the transpose-form bits into one index
        uint64_t h = 0;
        for (int b = bits - 1; b >= 0; --b)
            for (int d = 0; d < 3; ++d)
                h = (h << 1) | ((X[d] >> b) & 1u);
        out[i] = h;
    }
}

// ---------------------------------------------------------------------------
// Async frame writer
// ---------------------------------------------------------------------------
struct Job {
    std::string path;
    std::vector<uint8_t> blob;
    int truncate;  // 1: rewrite file with magic + this frame only
};

struct Writer {
    std::thread th;
    std::mutex mu;
    std::condition_variable cv;
    std::deque<Job> q;
    std::atomic<bool> stop{false};
    std::atomic<int64_t> pending{0};
    std::string magic;

    void run() {
        for (;;) {
            Job j;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] { return stop.load() || !q.empty(); });
                if (q.empty()) {
                    if (stop.load()) return;
                    continue;
                }
                j = std::move(q.front());
                q.pop_front();
            }
            const char* mode = j.truncate ? "wb" : "ab";
            FILE* f = fopen(j.path.c_str(), mode);
            if (f) {
                if (j.truncate)
                    fwrite(magic.data(), 1, magic.size(), f);
                uint64_t len = j.blob.size();
                fwrite(&len, sizeof(len), 1, f);
                fwrite(j.blob.data(), 1, j.blob.size(), f);
                fclose(f);
            }
            pending.fetch_sub(1);
        }
    }
};

void* ht_writer_open(const char* magic, int magic_len) {
    Writer* w = new Writer();
    w->magic.assign(magic, magic_len);
    w->th = std::thread([w] { w->run(); });
    return (void*)w;
}

void ht_writer_enqueue(void* handle, const char* path,
                       const uint8_t* blob, int64_t n, int truncate) {
    Writer* w = (Writer*)handle;
    Job j;
    j.path = path;
    j.blob.assign(blob, blob + n);
    j.truncate = truncate;
    {
        std::lock_guard<std::mutex> lk(w->mu);
        w->q.push_back(std::move(j));
        w->pending.fetch_add(1);
    }
    w->cv.notify_one();
}

int64_t ht_writer_pending(void* handle) {
    return ((Writer*)handle)->pending.load();
}

void ht_writer_close(void* handle) {
    Writer* w = (Writer*)handle;
    w->stop.store(true);
    w->cv.notify_all();
    if (w->th.joinable()) w->th.join();
    delete w;
}

}  // extern "C"
