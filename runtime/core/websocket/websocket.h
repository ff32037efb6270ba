// Minimal RFC 6455 WebSocket implementation over POSIX sockets (the
// reference uses boost.beast, `runtime/core/websocket/*`; this build is
// dependency-free): HTTP upgrade handshake (SHA-1 + base64 from scratch),
// text/binary/close frames with masking support.
#ifndef WENET_TPU_WEBSOCKET_WEBSOCKET_H_
#define WENET_TPU_WEBSOCKET_WEBSOCKET_H_

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <sstream>
#include <string>
#include <vector>

namespace wenet_tpu {
namespace ws {

// ---------------------------------------------------------------- SHA-1
inline void Sha1(const uint8_t* data, size_t len, uint8_t out[20]) {
  uint32_t h[5] = {0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476,
                   0xC3D2E1F0};
  uint64_t ml = static_cast<uint64_t>(len) * 8;
  std::vector<uint8_t> msg(data, data + len);
  msg.push_back(0x80);
  while (msg.size() % 64 != 56) msg.push_back(0);
  for (int i = 7; i >= 0; --i)
    msg.push_back(static_cast<uint8_t>(ml >> (i * 8)));
  auto rol = [](uint32_t v, int s) { return (v << s) | (v >> (32 - s)); };
  for (size_t chunk = 0; chunk < msg.size(); chunk += 64) {
    uint32_t w[80];
    for (int i = 0; i < 16; ++i)
      w[i] = (msg[chunk + 4 * i] << 24) | (msg[chunk + 4 * i + 1] << 16) |
             (msg[chunk + 4 * i + 2] << 8) | msg[chunk + 4 * i + 3];
    for (int i = 16; i < 80; ++i)
      w[i] = rol(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
    for (int i = 0; i < 80; ++i) {
      uint32_t f, k;
      if (i < 20) {
        f = (b & c) | ((~b) & d);
        k = 0x5A827999;
      } else if (i < 40) {
        f = b ^ c ^ d;
        k = 0x6ED9EBA1;
      } else if (i < 60) {
        f = (b & c) | (b & d) | (c & d);
        k = 0x8F1BBCDC;
      } else {
        f = b ^ c ^ d;
        k = 0xCA62C1D6;
      }
      uint32_t tmp = rol(a, 5) + f + e + k + w[i];
      e = d;
      d = c;
      c = rol(b, 30);
      b = a;
      a = tmp;
    }
    h[0] += a;
    h[1] += b;
    h[2] += c;
    h[3] += d;
    h[4] += e;
  }
  for (int i = 0; i < 5; ++i) {
    out[4 * i] = h[i] >> 24;
    out[4 * i + 1] = h[i] >> 16;
    out[4 * i + 2] = h[i] >> 8;
    out[4 * i + 3] = h[i];
  }
}

inline std::string Base64(const uint8_t* data, size_t len) {
  static const char tbl[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  for (size_t i = 0; i < len; i += 3) {
    uint32_t v = data[i] << 16;
    if (i + 1 < len) v |= data[i + 1] << 8;
    if (i + 2 < len) v |= data[i + 2];
    out += tbl[(v >> 18) & 63];
    out += tbl[(v >> 12) & 63];
    out += i + 1 < len ? tbl[(v >> 6) & 63] : '=';
    out += i + 2 < len ? tbl[v & 63] : '=';
  }
  return out;
}

inline std::string AcceptKey(const std::string& client_key) {
  std::string magic = client_key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11";
  uint8_t digest[20];
  Sha1(reinterpret_cast<const uint8_t*>(magic.data()), magic.size(),
       digest);
  return Base64(digest, 20);
}

// ------------------------------------------------------------- Framing
enum Opcode : uint8_t {
  kContinuation = 0x0,
  kText = 0x1,
  kBinary = 0x2,
  kClose = 0x8,
  kPing = 0x9,
  kPong = 0xA,
};

inline bool ReadExact(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n) {
    ssize_t r = read(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

inline bool WriteExact(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n) {
    ssize_t w = write(fd, p, n);
    if (w <= 0) return false;
    p += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

// Reads one complete (possibly fragmented) message.
inline bool ReadMessage(int fd, Opcode* opcode, std::string* payload) {
  payload->clear();
  bool first = true;
  while (true) {
    uint8_t hdr[2];
    if (!ReadExact(fd, hdr, 2)) return false;
    bool fin = hdr[0] & 0x80;
    uint8_t op = hdr[0] & 0x0F;
    bool masked = hdr[1] & 0x80;
    uint64_t len = hdr[1] & 0x7F;
    if (len == 126) {
      uint8_t ext[2];
      if (!ReadExact(fd, ext, 2)) return false;
      len = (ext[0] << 8) | ext[1];
    } else if (len == 127) {
      uint8_t ext[8];
      if (!ReadExact(fd, ext, 8)) return false;
      len = 0;
      for (int i = 0; i < 8; ++i) len = (len << 8) | ext[i];
    }
    uint8_t mask[4] = {0, 0, 0, 0};
    if (masked && !ReadExact(fd, mask, 4)) return false;
    size_t off = payload->size();
    payload->resize(off + len);
    if (len && !ReadExact(fd, &(*payload)[off], len)) return false;
    if (masked) {
      for (uint64_t i = 0; i < len; ++i)
        (*payload)[off + i] ^= mask[i % 4];
    }
    if (first) {
      *opcode = static_cast<Opcode>(op);
      first = false;
    }
    if (op == kPing) {
      // transparently answer pings
      uint8_t out[2] = {0x80 | kPong, static_cast<uint8_t>(len)};
      WriteExact(fd, out, 2);
      if (len) WriteExact(fd, payload->data() + off, len);
      payload->resize(off);
      first = payload->empty();
      continue;
    }
    if (fin) return true;
  }
}

inline bool WriteMessage(int fd, Opcode opcode, const std::string& payload) {
  std::string hdr;
  hdr += static_cast<char>(0x80 | opcode);
  size_t n = payload.size();
  if (n < 126) {
    hdr += static_cast<char>(n);
  } else if (n < 65536) {
    hdr += static_cast<char>(126);
    hdr += static_cast<char>(n >> 8);
    hdr += static_cast<char>(n & 0xFF);
  } else {
    hdr += static_cast<char>(127);
    for (int i = 7; i >= 0; --i)
      hdr += static_cast<char>((static_cast<uint64_t>(n) >> (i * 8)) & 0xFF);
  }
  return WriteExact(fd, hdr.data(), hdr.size()) &&
         WriteExact(fd, payload.data(), payload.size());
}

// Performs the server side of the HTTP upgrade. Returns false on error.
inline bool ServerHandshake(int fd) {
  std::string request;
  char c;
  while (request.find("\r\n\r\n") == std::string::npos) {
    if (!ReadExact(fd, &c, 1)) return false;
    request += c;
    if (request.size() > 65536) return false;
  }
  auto pos = request.find("Sec-WebSocket-Key:");
  if (pos == std::string::npos) return false;
  pos += strlen("Sec-WebSocket-Key:");
  while (pos < request.size() && request[pos] == ' ') ++pos;
  auto end = request.find("\r\n", pos);
  std::string key = request.substr(pos, end - pos);
  std::string accept = AcceptKey(key);
  std::ostringstream resp;
  resp << "HTTP/1.1 101 Switching Protocols\r\n"
       << "Upgrade: websocket\r\n"
       << "Connection: Upgrade\r\n"
       << "Sec-WebSocket-Accept: " << accept << "\r\n\r\n";
  return WriteExact(fd, resp.str().data(), resp.str().size());
}

// Client side of the upgrade (for tests / client tool).
inline bool ClientHandshake(int fd, const std::string& host,
                            const std::string& path = "/") {
  std::string key_raw = "0123456789abcdef";
  std::string key = Base64(
      reinterpret_cast<const uint8_t*>(key_raw.data()), key_raw.size());
  std::ostringstream req;
  req << "GET " << path << " HTTP/1.1\r\n"
      << "Host: " << host << "\r\n"
      << "Upgrade: websocket\r\nConnection: Upgrade\r\n"
      << "Sec-WebSocket-Key: " << key << "\r\n"
      << "Sec-WebSocket-Version: 13\r\n\r\n";
  if (!WriteExact(fd, req.str().data(), req.str().size())) return false;
  std::string resp;
  char c;
  while (resp.find("\r\n\r\n") == std::string::npos) {
    if (!ReadExact(fd, &c, 1)) return false;
    resp += c;
  }
  return resp.find("101") != std::string::npos;
}

}  // namespace ws
}  // namespace wenet_tpu

#endif  // WENET_TPU_WEBSOCKET_WEBSOCKET_H_
