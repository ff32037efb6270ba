// From-scratch FLAC decoder (no third-party code).
//
// LibriSpeech — the reference's primary corpus
// (reference examples/librispeech/s0/run.sh:47-120) — ships as .flac, and
// this image has no codec library or ffmpeg/flac binary, so the framework
// carries its own decoder. Scope: the subset every LibriSpeech / libFLAC
// encode uses — 8/12/16/20/24-bit, 1-8 channels, constant/verbatim/
// fixed/LPC subframes, rice + rice2 residual partitions (incl. escape
// codes), wasted bits, all four stereo decorrelation modes, fixed and
// variable blocking. CRCs are parsed but not verified (decode speed; a
// corrupt stream surfaces as a sync error instead).
//
// Exposed both as a C++ API (serving runtime) and a C ABI consumed by
// ctypes from the Python data pipeline (wenet_celoss_tpu/data/flac.py).

#ifndef FRONTEND_FLAC_H_
#define FRONTEND_FLAC_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace wenet_tpu {

struct FlacAudio {
  int sample_rate = 0;
  int channels = 0;
  int bits_per_sample = 0;
  // Interleaved samples at the stream's bit depth (sign-extended).
  std::vector<int32_t> samples;
};

// Decode a whole FLAC stream from memory. Returns false on malformed
// input (partial frames decoded so far are kept in `out`).
bool DecodeFlac(const uint8_t* data, size_t len, FlacAudio* out);

}  // namespace wenet_tpu

extern "C" {
// C ABI for ctypes: decodes `data[0:len]`; on success (return 0) sets
// *out to a malloc'd interleaved int32 buffer the caller must free with
// flac_free, and fills channels/sample_rate/bits/num_frames (frames =
// samples per channel).
int flac_decode(const uint8_t* data, size_t len, int32_t** out,
                int32_t* channels, int32_t* sample_rate, int32_t* bits,
                int64_t* num_frames);
void flac_free(int32_t* p);
}

#endif  // FRONTEND_FLAC_H_
