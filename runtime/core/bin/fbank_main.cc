// Dump fbank features of a wav as binary float32 [T, num_bins] to stdout —
// used by the cross-language parity test against the JAX/numpy frontend.
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "frontend/fbank.h"
#include "frontend/wav.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: fbank_main wav_path [num_bins=80]\n");
    return 1;
  }
  int num_bins = argc > 2 ? std::atoi(argv[2]) : 80;
  wenet_tpu::WavReader reader(argv[1]);
  std::vector<float> wave(reader.data(),
                          reader.data() + reader.num_samples());
  wenet_tpu::Fbank fbank(num_bins, reader.sample_rate(),
                         reader.sample_rate() / 1000 * 25,
                         reader.sample_rate() / 1000 * 10);
  std::vector<std::vector<float>> feat;
  int t = fbank.Compute(wave, &feat);
  uint32_t t32 = t, d32 = num_bins;
  std::fwrite(&t32, 4, 1, stdout);
  std::fwrite(&d32, 4, 1, stdout);
  for (auto& row : feat) std::fwrite(row.data(), 4, row.size(), stdout);
  return 0;
}
