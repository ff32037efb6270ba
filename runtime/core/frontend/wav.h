// RIFF WAV reader/writer (capability parity with reference
// runtime/core/frontend/wav.h:60-241): PCM16/32/8 + IEEE float, chunk-
// scanning header parse, float samples in int16 range.
#ifndef WENET_TPU_FRONTEND_WAV_H_
#define WENET_TPU_FRONTEND_WAV_H_

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace wenet_tpu {

class WavReader {
 public:
  explicit WavReader(const std::string& filename) { Open(filename); }

  void Open(const std::string& filename) {
    FILE* fp = std::fopen(filename.c_str(), "rb");
    if (!fp) throw std::runtime_error("cannot open " + filename);
    char riff[4] = {}, wave[4] = {};
    uint32_t size = 0;
    if (std::fread(riff, 1, 4, fp) != 4 || std::fread(&size, 4, 1, fp) != 1 ||
        std::fread(wave, 1, 4, fp) != 4 || std::memcmp(riff, "RIFF", 4) ||
        std::memcmp(wave, "WAVE", 4)) {
      // FLAC fallback — LibriSpeech ships .flac; the reference pushes
      // format handling to sox in its recipes, here the in-tree decoder
      // (frontend/flac.cc) serves the runtime directly.
      if (!std::memcmp(riff, "fLaC", 4)) {
        std::fclose(fp);
        OpenFlac(filename);
        return;
      }
      std::fclose(fp);
      throw std::runtime_error("not a RIFF/WAVE file: " + filename);
    }
    uint16_t audio_format = 0, bits = 0;
    bool got_fmt = false;
    std::vector<char> data;
    while (true) {
      char id[4];
      uint32_t chunk_size;
      if (std::fread(id, 1, 4, fp) != 4 ||
          std::fread(&chunk_size, 4, 1, fp) != 1)
        break;
      if (!std::memcmp(id, "fmt ", 4)) {
        std::vector<char> fmt(chunk_size);
        if (std::fread(fmt.data(), 1, chunk_size, fp) != chunk_size) break;
        std::memcpy(&audio_format, fmt.data(), 2);
        std::memcpy(&num_channels_, fmt.data() + 2, 2);
        std::memcpy(&sample_rate_, fmt.data() + 4, 4);
        std::memcpy(&bits, fmt.data() + 14, 2);
        got_fmt = true;
      } else if (!std::memcmp(id, "data", 4)) {
        data.resize(chunk_size);
        size_t got = std::fread(data.data(), 1, chunk_size, fp);
        data.resize(got);
        break;
      } else {
        std::fseek(fp, chunk_size + (chunk_size & 1), SEEK_CUR);
      }
    }
    std::fclose(fp);
    if (!got_fmt || data.empty())
      throw std::runtime_error("missing fmt/data chunk: " + filename);
    size_t n;
    if (audio_format == 1 && bits == 16) {
      n = data.size() / 2;
      samples_.resize(n);
      const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
      for (size_t i = 0; i < n; ++i) samples_[i] = static_cast<float>(p[i]);
    } else if (audio_format == 1 && bits == 32) {
      n = data.size() / 4;
      samples_.resize(n);
      const int32_t* p = reinterpret_cast<const int32_t*>(data.data());
      for (size_t i = 0; i < n; ++i) samples_[i] = p[i] / 65536.0f;
    } else if (audio_format == 1 && bits == 8) {
      n = data.size();
      samples_.resize(n);
      const uint8_t* p = reinterpret_cast<const uint8_t*>(data.data());
      for (size_t i = 0; i < n; ++i)
        samples_[i] = (static_cast<float>(p[i]) - 128.0f) * 256.0f;
    } else if (audio_format == 3 && bits == 32) {
      n = data.size() / 4;
      samples_.resize(n);
      const float* p = reinterpret_cast<const float*>(data.data());
      for (size_t i = 0; i < n; ++i) samples_[i] = p[i] * 32768.0f;
    } else {
      throw std::runtime_error("unsupported wav format");
    }
    num_samples_ = static_cast<int>(samples_.size()) / num_channels_;
  }

  int num_channels() const { return num_channels_; }
  int sample_rate() const { return static_cast<int>(sample_rate_); }
  int num_samples() const { return num_samples_; }
  const float* data() const { return samples_.data(); }

 private:
  void OpenFlac(const std::string& filename);

  uint16_t num_channels_ = 1;
  uint32_t sample_rate_ = 16000;
  int num_samples_ = 0;
  std::vector<float> samples_;
};

class WavWriter {
 public:
  WavWriter(const float* data, int num_samples, int num_channels,
            int sample_rate)
      : data_(data), num_samples_(num_samples), num_channels_(num_channels),
        sample_rate_(sample_rate) {}

  void Write(const std::string& filename) {
    FILE* fp = std::fopen(filename.c_str(), "wb");
    if (!fp) throw std::runtime_error("cannot write " + filename);
    uint32_t data_bytes = num_samples_ * num_channels_ * 2;
    uint32_t riff_size = 36 + data_bytes;
    uint32_t fmt_size = 16;
    uint16_t pcm = 1, ch = num_channels_, block = ch * 2, bits = 16;
    uint32_t sr = sample_rate_, byterate = sr * block;
    std::fwrite("RIFF", 1, 4, fp);
    std::fwrite(&riff_size, 4, 1, fp);
    std::fwrite("WAVE", 1, 4, fp);
    std::fwrite("fmt ", 1, 4, fp);
    std::fwrite(&fmt_size, 4, 1, fp);
    std::fwrite(&pcm, 2, 1, fp);
    std::fwrite(&ch, 2, 1, fp);
    std::fwrite(&sr, 4, 1, fp);
    std::fwrite(&byterate, 4, 1, fp);
    std::fwrite(&block, 2, 1, fp);
    std::fwrite(&bits, 2, 1, fp);
    std::fwrite("data", 1, 4, fp);
    std::fwrite(&data_bytes, 4, 1, fp);
    for (int i = 0; i < num_samples_ * num_channels_; ++i) {
      float v = data_[i];
      if (v > 32767.0f) v = 32767.0f;
      if (v < -32768.0f) v = -32768.0f;
      int16_t s = static_cast<int16_t>(v >= 0 ? v + 0.5f : v - 0.5f);
      std::fwrite(&s, 2, 1, fp);
    }
    std::fclose(fp);
  }

 private:
  const float* data_;
  int num_samples_;
  int num_channels_;
  int sample_rate_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_FRONTEND_WAV_H_
