// fastio: threaded scatter-read + chunk prefetch for movie files.
//
// The reference package parallelizes file IO with torch DataLoader worker
// *processes* (reference pmd_loader.py:151-168) — heavyweight, pickling
// every chunk across process boundaries, and flagged "experimental and best
// kept at 0" in its own docs. This native library replaces that with a
// thread pool doing positioned reads (pread) directly into the caller's
// buffer (zero-copy into numpy), plus an async one-chunk-ahead prefetcher so
// disk IO overlaps host->device transfer and TPU compute.
//
// Exposed C ABI (consumed via ctypes from localmd_tpu.io.native):
//   fastio_open(path)                         -> handle (>=0) or -errno
//   fastio_close(handle)
//   fastio_read_scatter(handle, offsets[], sizes[], n, out, out_stride,
//                       n_threads)            -> 0 or -errno
//   fastio_prefetch_submit(handle, offsets[], sizes[], n, out, out_stride,
//                          n_threads)         -> ticket (>=0)
//   fastio_prefetch_wait(ticket)              -> 0 or -errno
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread fastio.cpp -o libfastio.so

#include <atomic>
#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <future>
#include <map>
#include <memory>
#include <mutex>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct FileHandle {
    int fd = -1;
};

std::mutex g_mutex;
std::map<int64_t, FileHandle> g_files;
int64_t g_next_handle = 1;

std::map<int64_t, std::future<int64_t>> g_tickets;
int64_t g_next_ticket = 1;

// Read `n` records described by (offsets[i], sizes[i]) into
// out + i * out_stride, fanned out over `n_threads` threads.
int64_t scatter_read(int fd, const int64_t* offsets, const int64_t* sizes,
                     int64_t n, uint8_t* out, int64_t out_stride,
                     int64_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = n;
    std::atomic<int64_t> next{0};
    std::atomic<int64_t> err{0};

    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n || err.load() != 0) return;
            int64_t remaining = sizes[i];
            int64_t off = offsets[i];
            uint8_t* dst = out + i * out_stride;
            while (remaining > 0) {
                ssize_t got = pread(fd, dst, remaining, off);
                if (got < 0) {
                    if (errno == EINTR) continue;
                    err.store(-errno);
                    return;
                }
                if (got == 0) {  // unexpected EOF
                    err.store(-EIO);
                    return;
                }
                remaining -= got;
                off += got;
                dst += got;
            }
        }
    };

    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return err.load();
}

int get_fd(int64_t handle) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_files.find(handle);
    return it == g_files.end() ? -1 : it->second.fd;
}

}  // namespace

extern "C" {

int64_t fastio_open(const char* path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -errno;
#ifdef POSIX_FADV_SEQUENTIAL
    posix_fadvise(fd, 0, 0, POSIX_FADV_SEQUENTIAL);
#endif
    std::lock_guard<std::mutex> lk(g_mutex);
    int64_t h = g_next_handle++;
    g_files[h] = FileHandle{fd};
    return h;
}

int64_t fastio_close(int64_t handle) {
    std::lock_guard<std::mutex> lk(g_mutex);
    auto it = g_files.find(handle);
    if (it == g_files.end()) return -EBADF;
    close(it->second.fd);
    g_files.erase(it);
    return 0;
}

int64_t fastio_read_scatter(int64_t handle, const int64_t* offsets,
                            const int64_t* sizes, int64_t n, uint8_t* out,
                            int64_t out_stride, int64_t n_threads) {
    int fd = get_fd(handle);
    if (fd < 0) return -EBADF;
    return scatter_read(fd, offsets, sizes, n, out, out_stride, n_threads);
}

// Submit an async scatter read; copies the offset/size arrays so the caller
// may free them immediately. The output buffer must stay alive until wait.
int64_t fastio_prefetch_submit(int64_t handle, const int64_t* offsets,
                               const int64_t* sizes, int64_t n, uint8_t* out,
                               int64_t out_stride, int64_t n_threads) {
    int fd = get_fd(handle);
    if (fd < 0) return -EBADF;
    auto offs = std::make_shared<std::vector<int64_t>>(offsets, offsets + n);
    auto szs = std::make_shared<std::vector<int64_t>>(sizes, sizes + n);
    auto fut = std::async(std::launch::async, [=]() {
        return scatter_read(fd, offs->data(), szs->data(), n, out, out_stride,
                            n_threads);
    });
    std::lock_guard<std::mutex> lk(g_mutex);
    int64_t ticket = g_next_ticket++;
    g_tickets[ticket] = std::move(fut);
    return ticket;
}

int64_t fastio_prefetch_wait(int64_t ticket) {
    std::future<int64_t> fut;
    {
        std::lock_guard<std::mutex> lk(g_mutex);
        auto it = g_tickets.find(ticket);
        if (it == g_tickets.end()) return -EINVAL;
        fut = std::move(it->second);
        g_tickets.erase(it);
    }
    return fut.get();
}

}  // extern "C"
