// C-API demo binary (reference runtime/core/bin/api_main.cc equivalent):
// decode one wav through the opaque-handle wenet_* API, exercising context
// hotwords and nbest/timestamp knobs from the command line.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "api/wenet_api.h"
#include "frontend/wav.h"

int main(int argc, char** argv) {
  std::string model_dir, wav_path;
  int nbest = 1;
  bool timestamp = false;
  std::vector<std::string> contexts;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--model_dir") model_dir = next();
    else if (a == "--wav_path") wav_path = next();
    else if (a == "--nbest") nbest = std::atoi(next().c_str());
    else if (a == "--enable_timestamp")
      timestamp = std::atoi(next().c_str()) != 0;
    else if (a == "--context") contexts.push_back(next());
    else {
      std::fprintf(stderr, "unknown flag %s\n", a.c_str());
      return 1;
    }
  }
  if (model_dir.empty() || wav_path.empty()) {
    std::fprintf(stderr,
                 "usage: api_main --model_dir DIR --wav_path WAV "
                 "[--nbest N] [--enable_timestamp 0|1] "
                 "[--context WORD]...\n");
    return 1;
  }

  void* decoder = wenet_init(model_dir.c_str());
  if (!decoder) {
    std::fprintf(stderr, "wenet_init failed for %s\n", model_dir.c_str());
    return 1;
  }
  wenet_set_nbest(decoder, nbest);
  wenet_set_timestamp(decoder, timestamp ? 1 : 0);
  for (const auto& w : contexts) wenet_add_context(decoder, w.c_str());

  wenet_tpu::WavReader reader(wav_path);
  std::vector<int16_t> pcm(reader.num_samples());
  for (int i = 0; i < reader.num_samples(); ++i) {
    pcm[i] = static_cast<int16_t>(reader.data()[i]);
  }
  wenet_decode(decoder,
               reinterpret_cast<const char*>(pcm.data()),
               static_cast<int>(pcm.size() * sizeof(int16_t)), 1);
  std::printf("%s\n", wenet_get_result(decoder));
  wenet_free(decoder);
  return 0;
}
