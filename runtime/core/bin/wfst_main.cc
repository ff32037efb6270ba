// Standalone WFST (LG) beam-search driver for cross-language parity tests:
// loads lg.bin (tools/fst/build_lg.py) + a text matrix of CTC log-probs,
// prints the n-best (cost, word ids, unit ids) — compared against
// wenet_celoss_tpu.lm.fst.wfst_beam_decode by tests/test_wfst.py.
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "decoder/wfst_beam_search.h"

using namespace wenet_tpu;

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: wfst_main lg.bin logp.txt [beam] [lm_scale] "
                 "[acoustic_scale] [blank_skip_thresh] [nbest]\n");
    return 1;
  }
  auto fst = std::make_shared<LgFst>();
  if (!fst->Read(argv[1])) {
    std::fprintf(stderr, "failed to read %s\n", argv[1]);
    return 1;
  }
  WfstBeamSearchOptions opts;
  if (argc > 3) opts.beam = std::atof(argv[3]);
  if (argc > 4) opts.lm_scale = std::atof(argv[4]);
  if (argc > 5) opts.acoustic_scale = std::atof(argv[5]);
  if (argc > 6) opts.blank_skip_thresh = std::atof(argv[6]);
  if (argc > 7) opts.nbest = std::atoi(argv[7]);
  opts.max_active = 1 << 30;

  std::vector<std::vector<float>> logp;
  std::ifstream in(argv[2]);
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    std::vector<float> row;
    float v;
    while (ss >> v) row.push_back(v);
    if (!row.empty()) logp.push_back(std::move(row));
  }

  WfstBeamSearch search(fst, opts);
  search.Search(logp);
  search.FinalizeSearch();
  for (size_t i = 0; i < search.Outputs().size(); ++i) {
    std::printf("%.6f |", -search.Likelihood()[i]);
    for (int w : search.Outputs()[i]) std::printf(" %d", w);
    std::printf(" |");
    for (int u : search.Inputs()[i]) std::printf(" %d", u);
    std::printf(" |");
    for (int t : search.Times()[i]) std::printf(" %d", t);
    std::printf("\n");
  }
  return 0;
}
