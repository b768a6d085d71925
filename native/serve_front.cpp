// Native HTTP ingest front for the batched streaming server (T11's
// deployable tier with the hot path in C++).
//
// Why this exists (measured, docs/RESULTS.md "HTTP-tier capacity"): the
// stdlib http.server tier costs ~4 ms of Python per request on this
// 1-core serving host, capping the deployable endpoint at ~0.62x of the
// direct-drive number even with keep-alive and pipelined feeds. The
// reference (SURVEY.md §2.1 C15) has no service at all; this front is the
// TPU-native framework's native runtime tier for serving, mirroring
// native/audio_ingest.cpp on the training-ingest side.
//
// Division of labor:
//   C++ (this file, no GIL):
//     - socket accept + HTTP/1.1 keep-alive parsing (thread/connection)
//     - per-stream WIRE-FORM byte buffers (the single source of truth
//       for pending audio; Python-side BatchedStreamingServer buffers
//       stay empty in native mode)
//     - the hot route: POST /v1/streams/<sid>/audio whose body
//       Content-Type matches the server's wire format -> validate,
//       append, backpressure, reply JSON — zero Python per request
//     - GET /v1/healthz (open streams / backlog gauges)
//     - sync-feed semantics: wait until the chunks this feed completed
//       are folded (tick-done notification from Python)
//   Python (mla_tpu/serve/native_front.py):
//     - ONE tick thread: sf_wait_gather() blocks here (ctypes releases
//       the GIL) until >=1 stream has a full chunk (+ a straggler grace
//       window), receives the whole gathered [S, chunk] batch + active
//       mask in one call, runs the jitted device tick, sf_tick_done()
//     - worker threads: sf_next_request()/sf_respond() for the slow
//       routes (open/close/flush/scores/tag, mismatched wire formats,
//       WAV bodies) — rare per stream, so their Python cost is off the
//       steady-state path
//
// Locking: ONE mutex (mu) guards stream buffers + the request queue +
// tick state. Condition variables: cv_data (chunks became ready — wakes
// the gather call), cv_tick (a tick finished / a stream closed — wakes
// sync-feed and backpressure waiters), cv_queue (a slow request arrived).
// Connection threads never call into Python; Python never blocks while
// holding mu longer than a memcpy.
//
// Build: make -C native  (g++ -O3 -shared, no deps beyond pthread)

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

constexpr int WIRE_F32 = 0, WIRE_I16 = 1, WIRE_MULAW = 2, WIRE_ADPCM4 = 3,
              WIRE_ADPCM2 = 4;  // block geometry arrives via wb/block args
constexpr size_t MAX_HEADER_BYTES = 16 * 1024;
constexpr int IDLE_TIMEOUT_S = 120;   // keep-alive idle reap
constexpr int SYNC_TIMEOUT_S = 120;   // sync feed fold wait (tick thread gone)

struct Stream {
  bool open = false;
  std::vector<uint8_t> buf;  // pending wire bytes
  // Python-side adpcm sub-block remainder pending (a float/int16 feed
  // left <block samples un-encoded): wire appends would reorder audio,
  // so the fast path defers them to the slow path, which rejects with
  // the server's canonical message.
  bool slow_rem = false;
};

// Heap-allocated with shared ownership: the connection thread waits on
// it, but may time out and abandon it while a Python worker still holds
// the body pointer handed out by sf_next_request — the `pending` map's
// shared_ptr keeps the body alive until sf_respond either way.
struct PyReq {
  int64_t id;
  int method;  // 1 GET, 2 POST, 3 DELETE
  std::string path, query, ctype;
  int64_t x_samples;  // -1 absent
  std::vector<uint8_t> body;
  // response (filled by sf_respond)
  bool done = false;
  int status = 0;
  std::string resp;
  std::condition_variable cv;
};

struct Server {
  // config
  int wire_fmt;
  long chunk_bytes, hop_bytes;
  int wb, block_samples;  // adpcm4 wire-block geometry (0 otherwise)
  int max_backlog;
  long long max_body;
  long grace_us;
  std::vector<uint8_t> blank_row;  // chunk_bytes of wire silence
  std::string health_fragment;     // e.g. "\"variant\":\"...\",..."

  int listen_fd = -1;
  int port = 0;
  std::atomic<bool> stop{false};
  std::atomic<int> live_conns{0};

  std::mutex mu;
  std::condition_variable cv_data, cv_tick, cv_queue;
  bool tick_inflight = false;
  long long ticks = 0, ticked_streams = 0;  // healthz gauges (under mu)
  std::vector<Stream> streams;

  int64_t next_id = 1;
  std::deque<std::shared_ptr<PyReq>> queue;        // not yet taken by a worker
  std::unordered_map<int64_t, std::shared_ptr<PyReq>> pending;  // awaiting sf_respond

  std::thread accept_thread;

  long chunks_ready_locked(int sid) const {
    const auto& b = streams[sid].buf;
    if (!streams[sid].open || (long)b.size() < chunk_bytes) return 0;
    return ((long)b.size() - chunk_bytes) / hop_bytes + 1;
  }
  long backlog_locked() const {
    long n = tick_inflight ? 1 : 0;
    for (size_t s = 0; s < streams.size(); ++s)
      n += chunks_ready_locked((int)s);
    return n;
  }
};

// ---------------------------------------------------------------- HTTP io

bool send_all(int fd, const char* p, size_t n) {
  while (n) {
    ssize_t w = ::send(fd, p, n, MSG_NOSIGNAL);
    if (w < 0 && errno == EINTR) continue;
    if (w <= 0) return false;  // incl. SO_SNDTIMEO expiry (stuck client)
    p += w;
    n -= (size_t)w;
  }
  return true;
}

void respond(int fd, int status, const std::string& body, bool close_conn) {
  const char* text = "OK";
  switch (status) {
    case 400: text = "Bad Request"; break;
    case 404: text = "Not Found"; break;
    case 409: text = "Conflict"; break;
    case 413: text = "Payload Too Large"; break;
    case 422: text = "Unprocessable Entity"; break;
    case 500: text = "Internal Server Error"; break;
    case 501: text = "Not Implemented"; break;
    case 503: text = "Service Unavailable"; break;
  }
  char head[256];
  int n = snprintf(head, sizeof(head),
                   "HTTP/1.1 %d %s\r\nContent-Type: application/json\r\n"
                   "Content-Length: %zu\r\n%s\r\n",
                   status, text, body.size(),
                   close_conn ? "Connection: close\r\n" : "");
  send_all(fd, head, (size_t)n);
  send_all(fd, body.data(), body.size());
}

std::string jerr(const std::string& msg) {
  std::string out = "{\"error\": \"";
  for (char c : msg) {  // JSON string escape; error text may echo client
    if (c == '"' || c == '\\') out += '\\';     // bytes (e.g. the method
    if (c == '\n') { out += "\\n"; continue; }  // of a garbage request),
    if ((unsigned char)c < 0x20) {              // so raw control chars
      char buf[8];                              // must become \u00XX or
      snprintf(buf, sizeof(buf), "\\u%04x", c); // the body is not JSON
      out += buf;
      continue;
    }
    out += c;
  }
  out += "\"}";
  return out;
}

struct Request {
  std::string method, path, query, ctype;
  long long content_length = 0;
  int64_t x_samples = -1;
  bool keep_alive = true;
  bool expect_continue = false;
  bool chunked = false;
  std::vector<uint8_t> body;
};

// Reads one request's headers from the connection (using/refilling inbuf).
// Returns 1 ok, 0 clean close / idle timeout, -1 protocol error (respond
// 400 and close).
int read_headers(Server* sv, int fd, std::string& inbuf, Request& rq) {
  auto idle_deadline = Clock::now() + std::chrono::seconds(IDLE_TIMEOUT_S);
  size_t hdr_end;
  while ((hdr_end = inbuf.find("\r\n\r\n")) == std::string::npos) {
    if (inbuf.size() > MAX_HEADER_BYTES) return -1;
    if (sv->stop.load() || Clock::now() > idle_deadline) return 0;
    char tmp[8192];
    ssize_t r = ::recv(fd, tmp, sizeof(tmp), 0);
    if (r == 0) return 0;
    if (r < 0) {
      if (errno == EAGAIN || errno == EWOULDBLOCK || errno == EINTR) continue;
      return 0;
    }
    inbuf.append(tmp, (size_t)r);
  }
  std::string head = inbuf.substr(0, hdr_end);
  inbuf.erase(0, hdr_end + 4);

  size_t line_end = head.find("\r\n");
  std::string reqline =
      line_end == std::string::npos ? head : head.substr(0, line_end);
  size_t sp1 = reqline.find(' '), sp2 = reqline.rfind(' ');
  if (sp1 == std::string::npos || sp2 <= sp1) return -1;
  rq.method = reqline.substr(0, sp1);
  std::string target = reqline.substr(sp1 + 1, sp2 - sp1 - 1);
  std::string version = reqline.substr(sp2 + 1);
  rq.keep_alive = (version == "HTTP/1.1");
  size_t q = target.find('?');
  rq.path = target.substr(0, q);
  rq.query = q == std::string::npos ? "" : target.substr(q + 1);

  size_t pos = line_end == std::string::npos ? head.size() : line_end + 2;
  while (pos < head.size()) {
    size_t eol = head.find("\r\n", pos);
    if (eol == std::string::npos) eol = head.size();
    std::string line = head.substr(pos, eol - pos);
    pos = eol + 2;
    size_t colon = line.find(':');
    if (colon == std::string::npos) continue;
    std::string name = line.substr(0, colon);
    for (auto& c : name) c = (char)tolower((unsigned char)c);
    size_t vstart = line.find_first_not_of(" \t", colon + 1);
    std::string value = vstart == std::string::npos ? "" : line.substr(vstart);
    if (name == "content-length")
      rq.content_length = atoll(value.c_str());
    else if (name == "content-type")
      rq.ctype = value;
    else if (name == "x-samples") {
      char* end = nullptr;
      long long v = strtoll(value.c_str(), &end, 10);
      if (end != value.c_str() && v >= 0) rq.x_samples = v;
    } else if (name == "connection") {
      for (auto& c : value) c = (char)tolower((unsigned char)c);
      if (value.find("close") != std::string::npos) rq.keep_alive = false;
      if (value.find("keep-alive") != std::string::npos) rq.keep_alive = true;
    } else if (name == "expect") {
      for (auto& c : value) c = (char)tolower((unsigned char)c);
      if (value.find("100-continue") != std::string::npos)
        rq.expect_continue = true;
    } else if (name == "transfer-encoding") {
      for (auto& c : value) c = (char)tolower((unsigned char)c);
      if (value.find("chunked") != std::string::npos) rq.chunked = true;
    }
  }
  return 1;
}

bool read_body(Server* sv, int fd, std::string& inbuf, Request& rq) {
  rq.body.clear();
  long long need = rq.content_length;
  if (need <= 0) return true;
  rq.body.reserve((size_t)need);
  size_t take = std::min((size_t)need, inbuf.size());
  rq.body.insert(rq.body.end(), inbuf.begin(), inbuf.begin() + take);
  inbuf.erase(0, take);
  need -= (long long)take;
  auto deadline = Clock::now() + std::chrono::seconds(IDLE_TIMEOUT_S);
  char tmp[65536];
  while (need > 0) {
    if (sv->stop.load() || Clock::now() > deadline) return false;
    ssize_t r = ::recv(fd, tmp, (size_t)std::min<long long>(need, sizeof(tmp)), 0);
    if (r == 0) return false;
    if (r < 0) {
      if (errno == EAGAIN || errno == EWOULDBLOCK || errno == EINTR) continue;
      return false;
    }
    rq.body.insert(rq.body.end(), tmp, tmp + r);
    need -= r;
  }
  return true;
}

// ------------------------------------------------------------- routing

// "/v1/streams/<sid>/audio" -> sid (or -1), sets *leaf to the suffix.
// The digit run is bounded: an overflowing sid must 404, not wrap into
// another client's live slot (atoi("4294967298") == 2 on this libc).
int parse_stream_path(const std::string& path, std::string* leaf) {
  const char prefix[] = "/v1/streams/";
  if (path.compare(0, sizeof(prefix) - 1, prefix) != 0) return -1;
  size_t p = sizeof(prefix) - 1, q = p;
  while (q < path.size() && isdigit((unsigned char)path[q])) ++q;
  if (q == p || q - p > 9) return -1;  // >9 digits: no valid slot
  *leaf = q < path.size() ? path.substr(q) : "";
  if (!leaf->empty() && (*leaf)[0] != '/') return -1;
  if (!leaf->empty()) *leaf = leaf->substr(1);
  return atoi(path.substr(p, q - p).c_str());
}

bool query_async(const std::string& query) {
  // mirrors the Python tier: "?sync=0" anywhere in the query string
  return query.find("sync=0") != std::string::npos;
}

// Does the body Content-Type match the server's wire format? (Only then
// can bytes be buffered without host transcoding.)
bool ctype_matches_wire(int wire_fmt, const std::string& ctype) {
  auto starts = [&](const char* p) {
    return ctype.compare(0, strlen(p), p) == 0;
  };
  switch (wire_fmt) {
    case WIRE_ADPCM4:
      return starts("audio/adpcm4");
    case WIRE_ADPCM2:
      return starts("audio/adpcm2");
    case WIRE_MULAW:
      return starts("audio/basic");
    case WIRE_I16:
      return starts("audio/L16") || starts("audio/l16");
    case WIRE_F32:
      // raw f32 PCM is the fallthrough format in the Python tier: no
      // Content-Type, octet-stream, or anything that is not one of the
      // named audio formats and not a WAV container
      return ctype.empty() || starts("application/octet-stream");
  }
  return false;
}

// Fast-path audio POST. Returns true if handled here (response sent);
// false -> caller forwards to the Python slow path.
bool handle_audio_fast(Server* sv, int fd, int sid, const Request& rq) {
  if (!ctype_matches_wire(sv->wire_fmt, rq.ctype)) return false;
  // untyped bodies on the f32 wire may still be WAV containers (the
  // Python tier sniffs RIFF magic when no named format is declared) —
  // those need host decoding, so defer them to the slow path
  if (sv->wire_fmt == WIRE_F32 && rq.body.size() >= 4 &&
      memcmp(rq.body.data(), "RIFF", 4) == 0)
    return false;
  const bool adpcm =
      sv->wire_fmt == WIRE_ADPCM4 || sv->wire_fmt == WIRE_ADPCM2;
  long unit = sv->wire_fmt == WIRE_F32 ? 4
              : sv->wire_fmt == WIRE_I16 ? 2
              : sv->wire_fmt == WIRE_MULAW ? 1
                                           : sv->wb;
  if ((long)rq.body.size() % unit) {
    const char* what = sv->wire_fmt == WIRE_F32 ? "multiple of 4 (float32 LE)"
                       : sv->wire_fmt == WIRE_I16
                           ? "multiple of 2 (int16 LE)"
                           : "whole wire blocks";
    respond(fd, 400, jerr(std::string("body length must be a ") + what),
            !rq.keep_alive);
    return true;
  }
  long long fed = adpcm
                      ? (long long)rq.body.size() / sv->wb * sv->block_samples
                      : (long long)rq.body.size() / unit;
  bool async = query_async(rq.query);
  long advanced;
  {
    std::unique_lock<std::mutex> lk(sv->mu);
    if (sid < 0 || sid >= (int)sv->streams.size() || !sv->streams[sid].open) {
      lk.unlock();
      respond(fd, 404,
              jerr("stream " + std::to_string(sid) + " is not open"),
              !rq.keep_alive);
      return true;
    }
    if (sv->streams[sid].slow_rem) return false;  // ordering: defer to Python
    auto& buf = sv->streams[sid].buf;
    buf.insert(buf.end(), rq.body.begin(), rq.body.end());
    advanced = sv->chunks_ready_locked(sid);
    if (advanced) sv->cv_data.notify_all();
    auto deadline = Clock::now() + std::chrono::seconds(SYNC_TIMEOUT_S);
    if (!async && advanced > 0) {
      // sync: return only after the chunks this feed completed are folded
      // into device state (the Python tier's _wait_drained semantics —
      // which it skips, as here, when the feed completed no chunk)
      while (!sv->stop.load() && sv->streams[sid].open &&
             (sv->chunks_ready_locked(sid) > 0 || sv->tick_inflight)) {
        if (sv->cv_tick.wait_until(lk, deadline) == std::cv_status::timeout) {
          lk.unlock();
          respond(fd, 503, jerr("device tick thread unresponsive"), true);
          return true;
        }
      }
    } else {
      // pipelined: bounded backlog backpressure only
      while (!sv->stop.load() && sv->streams[sid].open &&
             sv->chunks_ready_locked(sid) > sv->max_backlog) {
        if (sv->cv_tick.wait_until(lk, deadline) == std::cv_status::timeout) {
          lk.unlock();
          respond(fd, 503, jerr("device tick thread unresponsive"), true);
          return true;
        }
      }
    }
  }
  char body[96];
  int n = snprintf(body, sizeof(body),
                   "{\"fed_samples\": %lld, \"advanced\": %ld}", fed, advanced);
  respond(fd, 200, std::string(body, (size_t)n), !rq.keep_alive);
  return true;
}

void handle_healthz(Server* sv, int fd, const Request& rq) {
  long open_n = 0, backlog;
  long long ticks, ticked;
  {
    std::lock_guard<std::mutex> lk(sv->mu);
    for (const auto& s : sv->streams) open_n += s.open ? 1 : 0;
    backlog = sv->backlog_locked();
    ticks = sv->ticks;
    ticked = sv->ticked_streams;
  }
  char body[640];
  int n = snprintf(body, sizeof(body),
                   "{\"ok\": true, \"open_streams\": %ld, \"backlog\": %ld, "
                   "\"max_streams\": %zu, \"ticks\": %lld, "
                   "\"ticked_streams\": %lld, \"native_front\": true%s%s}",
                   open_n, backlog, sv->streams.size(), ticks, ticked,
                   sv->health_fragment.empty() ? "" : ", ",
                   sv->health_fragment.c_str());
  respond(fd, 200, std::string(body, (size_t)n), !rq.keep_alive);
}

// Slow path: enqueue for a Python worker, wait for sf_respond.
void handle_python(Server* sv, int fd, Request& rq) {
  auto pr = std::make_shared<PyReq>();
  pr->method = rq.method == "GET" ? 1 : rq.method == "POST" ? 2 : 3;
  pr->path = rq.path;
  pr->query = rq.query;
  pr->ctype = rq.ctype;
  pr->x_samples = rq.x_samples;
  pr->body = std::move(rq.body);
  {
    std::unique_lock<std::mutex> lk(sv->mu);
    pr->id = sv->next_id++;
    sv->queue.push_back(pr);
    sv->pending[pr->id] = pr;  // owns the body until sf_respond
    sv->cv_queue.notify_one();
    auto deadline = Clock::now() + std::chrono::seconds(SYNC_TIMEOUT_S);
    while (!pr->done) {
      if (sv->stop.load() ||
          pr->cv.wait_until(lk, deadline) == std::cv_status::timeout) {
        // abandon: if no worker took it yet, withdraw it entirely; if a
        // worker holds the body pointer, `pending` keeps the PyReq alive
        // until its sf_respond (which finds the id and cleans up)
        for (auto it = sv->queue.begin(); it != sv->queue.end(); ++it)
          if (it->get() == pr.get()) {
            sv->queue.erase(it);
            sv->pending.erase(pr->id);
            break;
          }
        lk.unlock();
        respond(fd, 503, jerr("service worker unresponsive"), true);
        return;
      }
    }
  }
  respond(fd, pr->status, pr->resp, !rq.keep_alive);
}

void connection_loop(Server* sv, int fd) {
  struct timeval tv = {1, 0};  // recv wakes 1/s to observe stop
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  // bound sends too: a client that stops reading must not pin this
  // thread in send() past teardown (sf_stop waits for live_conns)
  struct timeval stv = {5, 0};
  setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &stv, sizeof(stv));
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  std::string inbuf;
  while (!sv->stop.load()) {
    Request rq;
    int st = read_headers(sv, fd, inbuf, rq);
    if (st <= 0) {
      if (st < 0) respond(fd, 400, jerr("malformed request"), true);
      break;
    }
    if (rq.chunked) {
      respond(fd, 501, jerr("chunked transfer encoding not supported"), true);
      break;
    }
    if (rq.method != "GET" && rq.method != "POST" && rq.method != "DELETE") {
      // HEAD/OPTIONS/PUT/... must NOT fall through to the Python queue,
      // where the 3-way method code would alias them to DELETE and a
      // monitoring probe could close a live stream. A body on this path
      // is never read — keeping the connection would desync the next
      // request on it (same hygiene as the Python tier's _reply guard).
      bool close_conn = !rq.keep_alive || rq.content_length > 0;
      respond(fd, 501,
              jerr("method " + rq.method.substr(0, 32) + " not supported"),
              close_conn);
      if (close_conn) break;
      continue;
    }
    if (rq.content_length > sv->max_body) {
      // body never read: the connection is desynced, so close it
      respond(fd, 413,
              jerr("body " + std::to_string(rq.content_length) +
                   " bytes exceeds " + std::to_string(sv->max_body) +
                   "; stream audio in chunks"),
              true);
      break;
    }
    if (rq.expect_continue) send_all(fd, "HTTP/1.1 100 Continue\r\n\r\n", 25);
    if (!read_body(sv, fd, inbuf, rq)) break;

    std::string leaf;
    int sid = parse_stream_path(rq.path, &leaf);
    if (rq.method == "POST" && sid >= 0 && leaf == "audio") {
      if (handle_audio_fast(sv, fd, sid, rq)) {
        if (!rq.keep_alive) break;
        continue;
      }
    } else if (rq.method == "GET" && rq.path == "/v1/healthz") {
      handle_healthz(sv, fd, rq);
      if (!rq.keep_alive) break;
      continue;
    }
    handle_python(sv, fd, rq);
    if (!rq.keep_alive) break;
  }
  ::close(fd);
  sv->live_conns.fetch_sub(1);
}

void accept_loop(Server* sv) {
  while (!sv->stop.load()) {
    sockaddr_in peer{};
    socklen_t plen = sizeof(peer);
    int fd = ::accept(sv->listen_fd, (sockaddr*)&peer, &plen);
    if (fd < 0) {
      if (sv->stop.load()) return;
      if (errno == EAGAIN || errno == EWOULDBLOCK || errno == EINTR) continue;
      return;
    }
    if (sv->live_conns.load() >= 256) {  // runaway-client backstop
      respond(fd, 503, jerr("too many connections"), true);
      ::close(fd);
      continue;
    }
    sv->live_conns.fetch_add(1);
    std::thread(connection_loop, sv, fd).detach();
  }
}

}  // namespace

// ------------------------------------------------------------ C API

extern "C" {

typedef struct {
  int64_t id;
  int32_t method;  // 1 GET, 2 POST, 3 DELETE
  int32_t _pad;
  int64_t x_samples;  // -1 absent
  int64_t body_len;
  const uint8_t* body;
  char path[512];
  char query[256];
  char ctype[128];
} sf_req_view;

void* sf_start(const char* host, int port, int max_streams, int wire_fmt,
               long chunk_bytes, long hop_bytes, int wire_block_bytes,
               int wire_block_samples, int max_backlog, long long max_body,
               long grace_us, const uint8_t* blank_row,
               const char* health_fragment) {
  auto* sv = new Server();
  sv->wire_fmt = wire_fmt;
  sv->chunk_bytes = chunk_bytes;
  sv->hop_bytes = hop_bytes;
  sv->wb = wire_block_bytes;
  sv->block_samples = wire_block_samples;
  sv->max_backlog = max_backlog;
  sv->max_body = max_body;
  sv->grace_us = grace_us;
  sv->blank_row.assign(blank_row, blank_row + chunk_bytes);
  sv->health_fragment = health_fragment ? health_fragment : "";
  sv->streams.resize((size_t)max_streams);

  sv->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (sv->listen_fd < 0) {
    delete sv;
    return nullptr;
  }
  int one = 1;
  setsockopt(sv->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  struct timeval tv = {1, 0};  // accept wakes 1/s to observe stop
  setsockopt(sv->listen_fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (!host || !*host || strcmp(host, "localhost") == 0) {
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  } else if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    // unresolvable host must FAIL, not silently bind loopback while the
    // CLI prints the requested name (IPv4 dotted-quad or "localhost"
    // only; the Python caller raises on the nullptr)
    ::close(sv->listen_fd);
    delete sv;
    return nullptr;
  }
  if (::bind(sv->listen_fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
      ::listen(sv->listen_fd, 128) < 0) {
    ::close(sv->listen_fd);
    delete sv;
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  getsockname(sv->listen_fd, (sockaddr*)&addr, &alen);
  sv->port = ntohs(addr.sin_port);
  sv->accept_thread = std::thread(accept_loop, sv);
  return sv;
}

int sf_port(void* h) { return static_cast<Server*>(h)->port; }

// Two-phase teardown: sf_stop signals + reaps the socket side, but the
// Server must outlive every Python thread still inside a blocking call
// (sf_wait_gather / sf_next_request) — the caller joins those threads
// (they observe the stop return codes), THEN calls sf_free.
void sf_stop(void* h) {
  auto* sv = static_cast<Server*>(h);
  sv->stop.store(true);
  ::shutdown(sv->listen_fd, SHUT_RDWR);
  {
    std::lock_guard<std::mutex> lk(sv->mu);
    sv->cv_data.notify_all();
    sv->cv_tick.notify_all();
    sv->cv_queue.notify_all();
    for (auto& kv : sv->pending) kv.second->cv.notify_all();
  }
  sv->accept_thread.join();
  ::close(sv->listen_fd);
  // connection threads are detached; wait for them to observe stop (their
  // recv timeout is 1 s, send timeout 5 s) so the Server's cvars outlive
  // every waiter. 12 s covers a thread that just entered a stuck send.
  for (int i = 0; i < 1200 && sv->live_conns.load() > 0; ++i)
    std::this_thread::sleep_for(std::chrono::milliseconds(10));
}

// Did every detached connection thread exit? (sf_free is only safe then.)
int sf_quiesced(void* h) {
  return static_cast<Server*>(h)->live_conns.load() == 0 ? 1 : 0;
}

void sf_free(void* h) { delete static_cast<Server*>(h); }

void sf_stream_open(void* h, int sid) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  sv->streams[sid].open = true;
  sv->streams[sid].buf.clear();
  sv->streams[sid].slow_rem = false;
}

void sf_stream_close(void* h, int sid) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  sv->streams[sid].open = false;
  sv->streams[sid].buf.clear();
  sv->streams[sid].slow_rem = false;
  sv->cv_tick.notify_all();  // release sync waiters on this stream
}

void sf_set_rem(void* h, int sid, int has_remainder) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  sv->streams[sid].slow_rem = has_remainder != 0;
}

// Appends and reports the resulting ready-chunk count in ONE critical
// section: the tick thread may consume the chunk the moment mu drops, so
// a separate count query could already see 0 (the HTTP `advanced` field
// is "chunks this feed completed", counted at append time).
long sf_append(void* h, int sid, const uint8_t* data, long n) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  auto& buf = sv->streams[sid].buf;
  buf.insert(buf.end(), data, data + n);
  long ready = sv->chunks_ready_locked(sid);
  if (ready) sv->cv_data.notify_all();
  return ready;
}

long sf_chunks_ready(void* h, int sid) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  return sv->chunks_ready_locked(sid);
}

long sf_buffered(void* h, int sid) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  return (long)sv->streams[sid].buf.size();
}

// Drain a stream's remaining buffered bytes (the flush path tail).
long sf_take_all(void* h, int sid, uint8_t* out, long cap) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  auto& buf = sv->streams[sid].buf;
  long n = std::min((long)buf.size(), cap);
  memcpy(out, buf.data(), (size_t)n);
  buf.erase(buf.begin(), buf.begin() + n);
  sv->cv_tick.notify_all();  // backpressure waiters may proceed
  return n;
}

// Python tick thread: block until >=1 stream has a full chunk (+ grace
// for stragglers), then copy every ready stream's chunk into wav
// [S * chunk_bytes] (blank rows for the rest), set active[S], advance
// buffers, and mark a tick in flight. Returns #active (0 timeout,
// -1 stopped). The caller MUST call sf_tick_done after the device step.
int sf_wait_gather(void* h, uint8_t* wav, uint8_t* active, int timeout_ms) {
  auto* sv = static_cast<Server*>(h);
  std::unique_lock<std::mutex> lk(sv->mu);
  auto deadline = Clock::now() + std::chrono::milliseconds(timeout_ms);
  const size_t S = sv->streams.size();
  auto n_ready = [&]() {
    int n = 0;
    for (size_t s = 0; s < S; ++s) n += sv->chunks_ready_locked((int)s) > 0;
    return n;
  };
  auto n_with_data = [&]() {
    int n = 0;
    for (const auto& st : sv->streams) n += st.open && !st.buf.empty();
    return n > 0 ? n : 1;
  };
  while (!sv->stop.load()) {
    if (n_ready() > 0) break;
    if (sv->cv_data.wait_until(lk, deadline) == std::cv_status::timeout &&
        n_ready() == 0)
      return 0;
  }
  if (sv->stop.load()) return -1;
  if (sv->grace_us > 0) {
    auto gdeadline = Clock::now() + std::chrono::microseconds(sv->grace_us);
    while (!sv->stop.load() && n_ready() < n_with_data() &&
           Clock::now() < gdeadline)
      sv->cv_data.wait_until(lk, gdeadline);
    if (sv->stop.load()) return -1;
  }
  int n_active = 0;
  for (size_t s = 0; s < S; ++s) {
    uint8_t* row = wav + s * sv->chunk_bytes;
    if (sv->chunks_ready_locked((int)s) > 0) {
      auto& buf = sv->streams[s].buf;
      memcpy(row, buf.data(), (size_t)sv->chunk_bytes);
      buf.erase(buf.begin(), buf.begin() + sv->hop_bytes);
      active[s] = 1;
      ++n_active;
    } else {
      memcpy(row, sv->blank_row.data(), (size_t)sv->chunk_bytes);
      active[s] = 0;
    }
  }
  // n_active can be 0 here: the chunk that woke us may have vanished
  // during a cv wait (stream closed, flush drained it). Python skips
  // sf_tick_done for 0, so only mark a tick in flight when one will run.
  if (n_active > 0) {
    sv->tick_inflight = true;
    sv->ticks++;
    sv->ticked_streams += n_active;
  }
  return n_active;
}

// Tick gauges for healthz / the bench (one source of truth: incremented
// at gather time in sf_wait_gather, under the server mutex).
void sf_counters(void* h, long long* ticks, long long* ticked_streams) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  *ticks = sv->ticks;
  *ticked_streams = sv->ticked_streams;
}

void sf_tick_done(void* h) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  sv->tick_inflight = false;
  sv->cv_tick.notify_all();
}

// Wait until a stream has no full chunk buffered and no tick is in
// flight (the Python tier's _wait_drained). Returns 1 drained, 0 timeout,
// -1 stopped.
int sf_wait_drained(void* h, int sid, int timeout_ms) {
  auto* sv = static_cast<Server*>(h);
  std::unique_lock<std::mutex> lk(sv->mu);
  auto deadline = Clock::now() + std::chrono::milliseconds(timeout_ms);
  while (!sv->stop.load() &&
         sid >= 0 && sid < (int)sv->streams.size() && sv->streams[sid].open &&
         (sv->chunks_ready_locked(sid) > 0 || sv->tick_inflight)) {
    if (sv->cv_tick.wait_until(lk, deadline) == std::cv_status::timeout)
      return 0;
  }
  return sv->stop.load() ? -1 : 1;
}

// Python worker: fetch the next queued slow-path request. Returns 1
// (filled), 0 (timeout), -1 (stopped). The body pointer stays valid until
// sf_respond(id).
int sf_next_request(void* h, sf_req_view* out, int timeout_ms) {
  auto* sv = static_cast<Server*>(h);
  std::unique_lock<std::mutex> lk(sv->mu);
  auto deadline = Clock::now() + std::chrono::milliseconds(timeout_ms);
  while (sv->queue.empty()) {
    if (sv->stop.load()) return -1;
    if (sv->cv_queue.wait_until(lk, deadline) == std::cv_status::timeout)
      return 0;
  }
  std::shared_ptr<PyReq> pr = sv->queue.front();  // `pending` still owns it
  sv->queue.pop_front();
  out->id = pr->id;
  out->method = pr->method;
  out->x_samples = pr->x_samples;
  out->body_len = (int64_t)pr->body.size();
  out->body = pr->body.data();
  snprintf(out->path, sizeof(out->path), "%s", pr->path.c_str());
  snprintf(out->query, sizeof(out->query), "%s", pr->query.c_str());
  snprintf(out->ctype, sizeof(out->ctype), "%s", pr->ctype.c_str());
  return 1;
}

void sf_respond(void* h, int64_t id, int status, const char* body, long n) {
  auto* sv = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(sv->mu);
  auto it = sv->pending.find(id);
  if (it == sv->pending.end()) return;  // connection gave up (timeout)
  std::shared_ptr<PyReq> pr = it->second;
  sv->pending.erase(it);
  pr->status = status;
  pr->resp.assign(body, (size_t)n);
  pr->done = true;
  pr->cv.notify_all();
}

}  // extern "C"
