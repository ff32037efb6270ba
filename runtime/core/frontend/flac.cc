// From-scratch FLAC decoder — see flac.h for scope.

#include "frontend/flac.h"

#include <cstdlib>
#include <cstring>

namespace wenet_tpu {
namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  bool ok() const { return !error_; }
  size_t byte_pos() const { return pos_; }
  bool eof() const { return pos_ >= len_ && bit_ == 0; }

  void AlignToByte() {
    if (bit_ != 0) {
      bit_ = 0;
      ++pos_;
    }
  }

  // Read n (<= 32) bits MSB-first, unsigned.
  uint32_t Bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (pos_ >= len_) {
        error_ = true;
        return 0;
      }
      v = (v << 1) | ((data_[pos_] >> (7 - bit_)) & 1u);
      if (++bit_ == 8) {
        bit_ = 0;
        ++pos_;
      }
    }
    return v;
  }

  uint64_t Bits64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = Bits(n - 32);
      n = 32;
    }
    return (v << n) | Bits(n);
  }

  // Signed two's-complement read.
  int32_t SignedBits(int n) {
    uint32_t v = Bits(n);
    if (n == 0) return 0;
    if (n < 32 && (v & (1u << (n - 1)))) {
      return static_cast<int32_t>(v | (~0u << n));
    }
    return static_cast<int32_t>(v);
  }

  // Count 0 bits until (and consuming) the terminating 1.
  uint32_t Unary() {
    uint32_t q = 0;
    while (true) {
      if (pos_ >= len_) {
        error_ = true;
        return 0;
      }
      if ((data_[pos_] >> (7 - bit_)) & 1u) {
        if (++bit_ == 8) {
          bit_ = 0;
          ++pos_;
        }
        return q;
      }
      ++q;
      if (++bit_ == 8) {
        bit_ = 0;
        ++pos_;
      }
    }
  }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  int bit_ = 0;
  bool error_ = false;
};

inline int32_t ZigzagDecode(uint32_t v) {
  return static_cast<int32_t>(v >> 1) ^ -static_cast<int32_t>(v & 1);
}

// UTF-8-style extended number (frame/sample index), up to 36 bits.
bool ReadUtf8Number(BitReader* br, uint64_t* out) {
  uint32_t b0 = br->Bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80u) == 0) {
    v = b0;
  } else if ((b0 & 0xE0u) == 0xC0u) {
    v = b0 & 0x1Fu;
    extra = 1;
  } else if ((b0 & 0xF0u) == 0xE0u) {
    v = b0 & 0x0Fu;
    extra = 2;
  } else if ((b0 & 0xF8u) == 0xF0u) {
    v = b0 & 0x07u;
    extra = 3;
  } else if ((b0 & 0xFCu) == 0xF8u) {
    v = b0 & 0x03u;
    extra = 4;
  } else if ((b0 & 0xFEu) == 0xFCu) {
    v = b0 & 0x01u;
    extra = 5;
  } else if (b0 == 0xFEu) {
    v = 0;
    extra = 6;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br->Bits(8);
    if ((b & 0xC0u) != 0x80u) return false;
    v = (v << 6) | (b & 0x3Fu);
  }
  *out = v;
  return br->ok();
}

// Residual for one subframe: fills res[pred_order .. blocksize).
bool ReadResidual(BitReader* br, int blocksize, int pred_order,
                  int32_t* res) {
  uint32_t method = br->Bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = br->Bits(4);
  int partitions = 1 << porder;
  if ((blocksize >> porder) == 0) return false;
  if ((blocksize % partitions) != 0) return false;
  int idx = pred_order;
  for (int p = 0; p < partitions; ++p) {
    int n = blocksize >> porder;
    if (p == 0) n -= pred_order;
    if (n < 0) return false;
    uint32_t param = br->Bits(plen);
    if (param == escape) {
      uint32_t raw = br->Bits(5);
      for (int i = 0; i < n; ++i) res[idx++] = br->SignedBits(raw);
    } else {
      for (int i = 0; i < n; ++i) {
        uint32_t q = br->Unary();
        uint32_t r = param ? br->Bits(param) : 0;
        res[idx++] = ZigzagDecode((q << param) | r);
      }
    }
    if (!br->ok()) return false;
  }
  return idx == blocksize;
}

bool DecodeSubframe(BitReader* br, int blocksize, int bps, int32_t* out) {
  if (br->Bits(1) != 0) return false;  // padding bit
  uint32_t type = br->Bits(6);
  int wasted = 0;
  if (br->Bits(1)) wasted = static_cast<int>(br->Unary()) + 1;
  int eff_bps = bps - wasted;
  if (eff_bps <= 0 || eff_bps > 32) return false;

  if (type == 0) {  // CONSTANT
    int32_t v = br->SignedBits(eff_bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br->SignedBits(eff_bps);
  } else if ((type & 0x38u) == 0x08u) {  // FIXED, order 0-4
    int order = type & 0x07u;
    if (order > 4 || order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br->SignedBits(eff_bps);
    if (!ReadResidual(br, blocksize, order, out)) return false;
    switch (order) {
      case 0:
        break;
      case 1:
        for (int i = 1; i < blocksize; ++i) out[i] += out[i - 1];
        break;
      case 2:
        for (int i = 2; i < blocksize; ++i)
          out[i] += 2 * out[i - 1] - out[i - 2];
        break;
      case 3:
        for (int i = 3; i < blocksize; ++i)
          out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
        break;
      case 4:
        for (int i = 4; i < blocksize; ++i)
          out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                    out[i - 4];
        break;
    }
  } else if (type & 0x20u) {  // LPC, order 1-32
    int order = static_cast<int>(type & 0x1Fu) + 1;
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br->SignedBits(eff_bps);
    uint32_t prec = br->Bits(4);
    if (prec == 0xF) return false;
    int precision = static_cast<int>(prec) + 1;
    int shift = br->SignedBits(5);
    if (shift < 0) return false;
    int32_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br->SignedBits(precision);
    if (!ReadResidual(br, blocksize, order, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) {
        acc += static_cast<int64_t>(coef[j]) * out[i - 1 - j];
      }
      out[i] += static_cast<int32_t>(acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted) {
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  }
  return br->ok();
}

}  // namespace

bool DecodeFlac(const uint8_t* data, size_t len, FlacAudio* out) {
  if (len < 42 || std::memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  int channels = 0, bps = 0, sample_rate = 0;
  uint64_t total_samples = 0;
  bool have_streaminfo = false;
  // Metadata blocks.
  while (pos + 4 <= len) {
    uint8_t hdr = data[pos];
    uint32_t blen = (static_cast<uint32_t>(data[pos + 1]) << 16) |
                    (static_cast<uint32_t>(data[pos + 2]) << 8) |
                    data[pos + 3];
    pos += 4;
    if (pos + blen > len) return false;
    if ((hdr & 0x7Fu) == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* s = data + pos;
      sample_rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      channels = ((s[12] >> 1) & 0x7) + 1;
      bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      total_samples = (static_cast<uint64_t>(s[13] & 0x0F) << 32) |
                      (static_cast<uint64_t>(s[14]) << 24) |
                      (static_cast<uint64_t>(s[15]) << 16) |
                      (static_cast<uint64_t>(s[16]) << 8) | s[17];
      have_streaminfo = true;
    }
    pos += blen;
    if (hdr & 0x80u) break;  // last-metadata flag
  }
  if (!have_streaminfo || sample_rate == 0 || channels < 1 ||
      channels > 8) {
    return false;
  }
  out->sample_rate = sample_rate;
  out->channels = channels;
  out->bits_per_sample = bps;
  out->samples.clear();
  if (total_samples) {
    out->samples.reserve(static_cast<size_t>(total_samples) * channels);
  }

  BitReader br(data + pos, len - pos);
  std::vector<std::vector<int32_t>> ch(channels);
  while (!br.eof()) {
    // Frame sync.
    uint32_t sync = br.Bits(14);
    if (!br.ok()) break;  // clean EOF amid padding
    if (sync != 0x3FFE) return false;
    if (br.Bits(1) != 0) return false;  // reserved
    br.Bits(1);                         // blocking strategy
    uint32_t bs_code = br.Bits(4);
    uint32_t sr_code = br.Bits(4);
    uint32_t ch_code = br.Bits(4);
    uint32_t ss_code = br.Bits(3);
    if (br.Bits(1) != 0) return false;  // reserved
    uint64_t frame_no;
    if (!ReadUtf8Number(&br, &frame_no)) return false;

    int blocksize;
    switch (bs_code) {
      case 0:
        return false;
      case 1:
        blocksize = 192;
        break;
      case 6:
        blocksize = static_cast<int>(br.Bits(8)) + 1;
        break;
      case 7:
        blocksize = static_cast<int>(br.Bits(16)) + 1;
        break;
      default:
        blocksize = bs_code <= 5 ? 576 << (bs_code - 2)
                                 : 256 << (bs_code - 8);
    }
    switch (sr_code) {
      case 12:
        br.Bits(8);
        break;
      case 13:
      case 14:
        br.Bits(16);
        break;
      case 15:
        return false;
      default:
        break;  // table / streaminfo rates — streaminfo value is used
    }
    int frame_bps = bps;
    switch (ss_code) {
      case 0:
        break;
      case 1:
        frame_bps = 8;
        break;
      case 2:
        frame_bps = 12;
        break;
      case 4:
        frame_bps = 16;
        break;
      case 5:
        frame_bps = 20;
        break;
      case 6:
        frame_bps = 24;
        break;
      default:
        return false;
    }
    br.Bits(8);  // header CRC-8 (unverified)

    int nch = channels;
    int mode = 0;  // 0 independent, 1 left/side, 2 right/side, 3 mid/side
    if (ch_code <= 7) {
      nch = static_cast<int>(ch_code) + 1;
      if (nch != channels) return false;
    } else if (ch_code <= 10) {
      if (channels != 2) return false;
      nch = 2;
      mode = static_cast<int>(ch_code) - 7;
    } else {
      return false;
    }

    for (int c = 0; c < nch; ++c) {
      ch[c].resize(blocksize);
      int sub_bps = frame_bps;
      // Side channel carries one extra bit.
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
          (mode == 3 && c == 1)) {
        ++sub_bps;
      }
      if (!DecodeSubframe(&br, blocksize, sub_bps, ch[c].data())) {
        return false;
      }
    }
    br.AlignToByte();
    br.Bits(16);  // frame CRC-16 (unverified)
    if (!br.ok()) return false;

    // Undo stereo decorrelation.
    if (mode == 1) {  // left/side: right = left - side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (mode == 2) {  // right/side: left = right + side
      for (int i = 0; i < blocksize; ++i) ch[0][i] += ch[1][i];
    } else if (mode == 3) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int32_t mid = ch[0][i];
        int32_t side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }
    size_t base = out->samples.size();
    out->samples.resize(base + static_cast<size_t>(blocksize) * channels);
    for (int i = 0; i < blocksize; ++i) {
      for (int c = 0; c < channels; ++c) {
        out->samples[base + static_cast<size_t>(i) * channels + c] =
            ch[c][i];
      }
    }
    if (total_samples &&
        out->samples.size() >=
            static_cast<size_t>(total_samples) * channels) {
      break;  // trailing padding after the last frame
    }
  }
  if (total_samples) {
    const size_t expect = static_cast<size_t>(total_samples) * channels;
    if (out->samples.size() > expect) {
      out->samples.resize(expect);  // drop trailing padding
    } else if (out->samples.size() < expect) {
      // Truncated stream: report failure rather than silently padding
      // the missing tail with zeros (STREAMINFO promised more samples
      // than the frames delivered).
      return false;
    }
  }
  return true;
}

}  // namespace wenet_tpu

extern "C" {

int flac_decode(const uint8_t* data, size_t len, int32_t** out,
                int32_t* channels, int32_t* sample_rate, int32_t* bits,
                int64_t* num_frames) {
  wenet_tpu::FlacAudio audio;
  if (!wenet_tpu::DecodeFlac(data, len, &audio)) return 1;
  *channels = audio.channels;
  *sample_rate = audio.sample_rate;
  *bits = audio.bits_per_sample;
  *num_frames = audio.channels
                    ? static_cast<int64_t>(audio.samples.size()) /
                          audio.channels
                    : 0;
  *out = static_cast<int32_t*>(
      std::malloc(audio.samples.size() * sizeof(int32_t)));
  if (*out == nullptr) return 2;
  std::memcpy(*out, audio.samples.data(),
              audio.samples.size() * sizeof(int32_t));
  return 0;
}

void flac_free(int32_t* p) { std::free(p); }

}  // extern "C"

// WavReader's FLAC fallback (declared in frontend/wav.h).
#include <cstdio>
#include <stdexcept>
#include <string>

#include "frontend/wav.h"

namespace wenet_tpu {

void WavReader::OpenFlac(const std::string& filename) {
  FILE* fp = std::fopen(filename.c_str(), "rb");
  if (!fp) throw std::runtime_error("cannot open " + filename);
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  size_t got = std::fread(buf.data(), 1, buf.size(), fp);
  std::fclose(fp);
  buf.resize(got);
  FlacAudio audio;
  if (!DecodeFlac(buf.data(), buf.size(), &audio)) {
    throw std::runtime_error("flac decode failed: " + filename);
  }
  num_channels_ = static_cast<uint16_t>(audio.channels);
  sample_rate_ = static_cast<uint32_t>(audio.sample_rate);
  samples_.resize(audio.samples.size());
  // Scale to the int16-range float contract shared with the WAV paths.
  float scale = 1.0f;
  if (audio.bits_per_sample > 16) {
    scale = 1.0f / static_cast<float>(1 << (audio.bits_per_sample - 16));
  } else if (audio.bits_per_sample < 16) {
    scale = static_cast<float>(1 << (16 - audio.bits_per_sample));
  }
  for (size_t i = 0; i < audio.samples.size(); ++i) {
    samples_[i] = static_cast<float>(audio.samples[i]) * scale;
  }
  num_samples_ = audio.channels
                     ? static_cast<int>(samples_.size()) / audio.channels
                     : 0;
}

}  // namespace wenet_tpu
