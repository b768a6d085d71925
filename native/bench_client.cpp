// HTTP load generator for the serving benchmark (scripts/bench_serving.py
// --cpp-client).
//
// Why this exists (measured, docs/RESULTS.md "native front"): at 32
// streams the Python bench's own 32 client threads saturate this host's
// single CPU core (~4 ms of interpreter work per request under the GIL),
// so the reported number measures the LOAD GENERATOR, not the server
// (streams_per_tick showed the server idle-waiting at 22-30/32). This
// client replaces those threads with C++ ones (~tens of us per request),
// unbinding the measurement so the number reflects true server capacity.
//
// Protocol: one keep-alive HTTP/1.1 connection per stream, the same
// routes TagClient uses (POST /v1/streams, POST .../audio with the wire
// body, GET .../scores, DELETE). Bursts are barrier-coordinated across
// threads exactly like the Python bench's threading.Barrier, and each
// timed repeat ends with one scores fetch — the only real device
// synchronization on this platform (jax.block_until_ready is a no-op on
// axon; see CLAUDE.md).
//
// Usage:
//   bench_client <host> <port> <n_streams> <body_file> <ctype>
//                <ticks_per_repeat> <repeats> [sync01]
// Prints ONE JSON line: {"times": [s,...], "warm_s": s, "n_streams": N}.
//
// Build: make -C native bench_client

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// std::barrier is C++20; this is the minimal reusable equivalent.
struct Barrier {
  explicit Barrier(int n) : n_(n) {}
  void wait() {
    std::unique_lock<std::mutex> lk(mu_);
    int gen = gen_;
    if (++arrived_ == n_) {
      arrived_ = 0;
      ++gen_;
      cv_.notify_all();
    } else {
      cv_.wait(lk, [&] { return gen_ != gen; });
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  int n_, arrived_ = 0, gen_ = 0;
};

bool send_all(int fd, const char* p, size_t n) {
  while (n) {
    ssize_t w = ::send(fd, p, n, MSG_NOSIGNAL);
    if (w < 0 && errno == EINTR) continue;
    if (w <= 0) return false;
    p += w;
    n -= (size_t)w;
  }
  return true;
}

struct Conn {
  int fd = -1;
  std::string inbuf;

  bool connect_to(const char* host, int port) {
    fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return false;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    if (inet_pton(AF_INET, host, &addr.sin_addr) != 1)
      addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    if (::connect(fd, (sockaddr*)&addr, sizeof(addr)) < 0) return false;
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    return true;
  }

  // One round-trip on the keep-alive connection. Returns HTTP status
  // (or -1 on transport error); *resp gets the response body.
  int request(const std::string& method, const std::string& path,
              const char* ctype, const char* body, size_t body_len,
              std::string* resp) {
    char head[512];
    int hn;
    if (body) {
      hn = snprintf(head, sizeof(head),
                    "%s %s HTTP/1.1\r\nHost: b\r\nContent-Type: %s\r\n"
                    "Content-Length: %zu\r\n\r\n",
                    method.c_str(), path.c_str(), ctype, body_len);
    } else {
      hn = snprintf(head, sizeof(head),
                    "%s %s HTTP/1.1\r\nHost: b\r\nContent-Length: 0\r\n\r\n",
                    method.c_str(), path.c_str());
    }
    if (!send_all(fd, head, (size_t)hn)) return -1;
    if (body && !send_all(fd, body, body_len)) return -1;

    // read status line + headers
    size_t hdr_end;
    while ((hdr_end = inbuf.find("\r\n\r\n")) == std::string::npos) {
      char tmp[8192];
      ssize_t r = ::recv(fd, tmp, sizeof(tmp), 0);
      if (r < 0 && errno == EINTR) continue;
      if (r <= 0) return -1;
      inbuf.append(tmp, (size_t)r);
    }
    std::string hdrs = inbuf.substr(0, hdr_end);
    inbuf.erase(0, hdr_end + 4);
    int status = atoi(hdrs.c_str() + 9);  // "HTTP/1.1 NNN ..."
    long long clen = 0;
    {  // case-insensitive content-length scan
      std::string low = hdrs;
      for (auto& c : low) c = (char)tolower((unsigned char)c);
      size_t p = low.find("content-length:");
      if (p != std::string::npos) clen = atoll(low.c_str() + p + 15);
    }
    while ((long long)inbuf.size() < clen) {
      char tmp[8192];
      ssize_t r = ::recv(fd, tmp, sizeof(tmp), 0);
      if (r < 0 && errno == EINTR) continue;
      if (r <= 0) return -1;
      inbuf.append(tmp, (size_t)r);
    }
    if (resp) resp->assign(inbuf, 0, (size_t)clen);
    inbuf.erase(0, (size_t)clen);
    return status;
  }

  ~Conn() {
    if (fd >= 0) ::close(fd);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: %s host port n_streams body_file ctype ticks repeats "
            "[sync01]\n",
            argv[0]);
    return 2;
  }
  const char* host = argv[1];
  int port = atoi(argv[2]);
  int n_streams = atoi(argv[3]);
  const char* body_file = argv[4];
  const char* ctype = argv[5];
  int ticks = atoi(argv[6]);
  int repeats = atoi(argv[7]);
  bool sync = argc > 8 ? atoi(argv[8]) != 0 : true;

  std::ifstream f(body_file, std::ios::binary);
  std::string body((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  if (body.empty()) {
    fprintf(stderr, "empty body file %s\n", body_file);
    return 2;
  }

  Barrier barrier(n_streams + 1);
  std::atomic<bool> stop{false}, failed{false};
  std::vector<int> sids(n_streams, -1);
  std::vector<std::thread> threads;

  const int WARM = 2;  // first burst compiles the masked tick program
  std::string audio_sfx = sync ? "/audio" : "/audio?sync=0";

  for (int i = 0; i < n_streams; ++i) {
    threads.emplace_back([&, i] {
      Conn c;
      std::string resp;
      if (!c.connect_to(host, port) ||
          c.request("POST", "/v1/streams", nullptr, nullptr, 0, &resp) !=
              200) {
        fprintf(stderr, "stream %d: open failed\n", i);
        failed.store(true);
      } else {
        size_t p = resp.find("\"sid\":");
        sids[i] = p == std::string::npos ? -1 : atoi(resp.c_str() + p + 6);
      }
      std::string audio_path =
          "/v1/streams/" + std::to_string(sids[i]) + audio_sfx;
      for (;;) {
        barrier.wait();  // round start (or stop)
        if (stop.load()) break;
        if (!failed.load()) {
          for (int t = 0; t < ticks; ++t) {
            if (c.request("POST", audio_path, ctype, body.data(),
                          body.size(), nullptr) != 200) {
              fprintf(stderr, "stream %d: feed failed\n", i);
              failed.store(true);
              break;
            }
          }
        }
        barrier.wait();  // round done
      }
      if (sids[i] >= 0)
        c.request("DELETE", "/v1/streams/" + std::to_string(sids[i]), nullptr,
                  nullptr, 0, nullptr);
    });
  }

  Conn main_conn;
  if (!main_conn.connect_to(host, port)) {
    fprintf(stderr, "main: connect failed\n");
    stop.store(true);
    barrier.wait();
    for (auto& t : threads) t.join();
    return 1;
  }

  auto burst = [&]() -> bool {
    barrier.wait();  // release workers
    barrier.wait();  // workers done feeding
    if (failed.load()) return false;
    if (!sync) {
      // pipelined feeds: wait out the device backlog before the fetch
      std::string resp;
      for (;;) {
        if (main_conn.request("GET", "/v1/healthz", nullptr, nullptr, 0,
                              &resp) != 200)
          return false;
        size_t p = resp.find("\"backlog\":");
        if (p == std::string::npos || atol(resp.c_str() + p + 10) == 0) break;
        std::this_thread::sleep_for(std::chrono::milliseconds(2));
      }
    }
    // host fetch = the only real device synchronization on this platform
    std::string resp;
    return main_conn.request(
               "GET", "/v1/streams/" + std::to_string(sids[0]) + "/scores",
               nullptr, nullptr, 0, &resp) == 200;
  };

  auto t0 = std::chrono::steady_clock::now();
  for (int w = 0; w < WARM && !failed.load(); ++w) burst();
  double warm_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  std::vector<double> times;
  for (int r = 0; r < repeats && !failed.load(); ++r) {
    auto t1 = std::chrono::steady_clock::now();
    if (!burst()) break;
    times.push_back(
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t1)
            .count());
  }

  stop.store(true);
  barrier.wait();
  for (auto& t : threads) t.join();
  if (failed.load() || (int)times.size() != repeats) {
    fprintf(stderr, "bench failed (%zu/%d repeats)\n", times.size(), repeats);
    return 1;
  }
  printf("{\"times\": [");
  for (size_t i = 0; i < times.size(); ++i)
    printf("%s%.6f", i ? ", " : "", times[i]);
  printf("], \"warm_s\": %.3f, \"n_streams\": %d}\n", warm_s, n_streams);
  return 0;
}
