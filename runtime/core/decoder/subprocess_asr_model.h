// JAX/TPU inference backend over a worker subprocess.
//
// TPU-native replacement for the reference's in-process TorchScript engine
// (runtime/core/decoder/torch_asr_model.cc): the accelerator math lives in
// the JAX worker (wenet_celoss_tpu/bin/runtime_worker.py, one compiled
// streaming program), the C++ side owns IO, feature extraction, search and
// serving. Framed little-endian protocol over stdin/stdout pipes:
//   C++→py:  'I' cfg_len cfg_json              (init / reset stream)
//            'F' T D float32[T*D]              (forward feature chunk)
//            'G'                               (transducer greedy chunk)
//            'R' N rw { L int32[L] } * N       (attention rescoring)
//            'B' beam                          (transducer final beam)
//            'Q'                               (quit)
//   py→C++:  'O' T' V float32[T'*V]            (ctc log probs)
//            'S' N float32[N]                  (rescoring scores)
//            'N' n { L int32[L] f32 } * n      (beam n-best + scores)
//            'M' json                          (metadata after init)
#ifndef WENET_TPU_DECODER_SUBPROCESS_ASR_MODEL_H_
#define WENET_TPU_DECODER_SUBPROCESS_ASR_MODEL_H_

#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

#include "decoder/asr_model.h"

namespace wenet_tpu {

class SubprocessAsrModel : public AsrModel {
 public:
  // argv: e.g. {"python", "-m", "wenet_celoss_tpu.bin.runtime_worker",
  //             "--config", ..., "--checkpoint", ...}
  explicit SubprocessAsrModel(const std::vector<std::string>& argv) {
    Spawn(argv);
  }

  ~SubprocessAsrModel() override {
    if (pid_ > 0) {
      WriteTag('Q');
      close(to_child_);
      close(from_child_);
      int status;
      waitpid(pid_, &status, 0);
    }
  }

  void Reset() override {
    WriteTag('I');
    WriteU32(0);
    char tag = ReadTag();
    if (tag != 'M') throw std::runtime_error("worker: bad reset reply");
    uint32_t len = ReadU32();
    std::string meta(len, '\0');
    ReadAll(&meta[0], len);
    ParseMeta(meta);
  }

  void ForwardEncoderChunk(
      const std::vector<std::vector<float>>& chunk_feats,
      std::vector<std::vector<float>>* ctc_log_probs) override {
    uint32_t t = chunk_feats.size();
    uint32_t d = t ? chunk_feats[0].size() : 0;
    WriteTag('F');
    WriteU32(t);
    WriteU32(d);
    for (const auto& row : chunk_feats)
      WriteAll(row.data(), row.size() * sizeof(float));
    if (ReadTag() != 'O') throw std::runtime_error("worker: bad F reply");
    uint32_t t2 = ReadU32(), v = ReadU32();
    ctc_log_probs->assign(t2, std::vector<float>(v));
    for (auto& row : *ctc_log_probs)
      ReadAll(row.data(), v * sizeof(float));
  }

  void RnntGreedyChunk(std::vector<int>* new_tokens) override {
    WriteTag('G');
    if (ReadTag() != 'T') throw std::runtime_error("worker: bad G reply");
    uint32_t n = ReadU32();
    new_tokens->resize(n);
    if (n) ReadAll(new_tokens->data(), n * sizeof(int32_t));
  }

  void RnntBeamSearch(int beam, std::vector<std::vector<int>>* hyps,
                      std::vector<float>* scores) override {
    WriteTag('B');
    WriteU32(static_cast<uint32_t>(beam));
    if (ReadTag() != 'N') throw std::runtime_error("worker: bad B reply");
    uint32_t n = ReadU32();
    hyps->assign(n, {});
    scores->assign(n, 0.0f);
    for (uint32_t i = 0; i < n; ++i) {
      uint32_t l = ReadU32();
      (*hyps)[i].resize(l);
      if (l) ReadAll((*hyps)[i].data(), l * sizeof(int32_t));
      ReadAll(&(*scores)[i], sizeof(float));
    }
  }

  void AttentionRescoring(const std::vector<std::vector<int>>& hyps,
                          float reverse_weight,
                          std::vector<float>* rescoring_score) override {
    WriteTag('R');
    WriteU32(hyps.size());
    WriteAll(&reverse_weight, sizeof(float));
    for (const auto& h : hyps) {
      WriteU32(h.size());
      WriteAll(h.data(), h.size() * sizeof(int32_t));
    }
    if (ReadTag() != 'S') throw std::runtime_error("worker: bad R reply");
    uint32_t n = ReadU32();
    rescoring_score->resize(n);
    ReadAll(rescoring_score->data(), n * sizeof(float));
  }

 private:
  void Spawn(const std::vector<std::string>& argv) {
    int in_pipe[2], out_pipe[2];
    if (pipe(in_pipe) || pipe(out_pipe))
      throw std::runtime_error("pipe() failed");
    pid_ = fork();
    if (pid_ < 0) throw std::runtime_error("fork() failed");
    if (pid_ == 0) {
      dup2(in_pipe[0], 0);
      dup2(out_pipe[1], 1);
      close(in_pipe[0]);
      close(in_pipe[1]);
      close(out_pipe[0]);
      close(out_pipe[1]);
      std::vector<char*> args;
      for (const auto& a : argv) args.push_back(const_cast<char*>(a.c_str()));
      args.push_back(nullptr);
      execvp(args[0], args.data());
      _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    to_child_ = in_pipe[1];
    from_child_ = out_pipe[0];
    Reset();  // initial handshake
  }

  void ParseMeta(const std::string& meta) {
    // Tiny key:int parser for {"subsampling_rate":4,...}.
    auto get = [&](const char* key, int dflt) {
      auto pos = meta.find(key);
      if (pos == std::string::npos) return dflt;
      pos = meta.find(':', pos);
      if (pos == std::string::npos) return dflt;
      return std::atoi(meta.c_str() + pos + 1);
    };
    subsampling_rate_ = get("subsampling_rate", 4);
    right_context_ = get("right_context", 6);
    sos_ = get("sos", 0);
    eos_ = get("eos", 0);
  }

  void WriteTag(char t) { WriteAll(&t, 1); }
  void WriteU32(uint32_t v) { WriteAll(&v, 4); }
  char ReadTag() {
    char t;
    ReadAll(&t, 1);
    return t;
  }
  uint32_t ReadU32() {
    uint32_t v;
    ReadAll(&v, 4);
    return v;
  }
  void WriteAll(const void* buf, size_t n) {
    const char* p = static_cast<const char*>(buf);
    while (n) {
      ssize_t w = write(to_child_, p, n);
      if (w <= 0) throw std::runtime_error("worker pipe write failed");
      p += w;
      n -= w;
    }
  }
  void ReadAll(void* buf, size_t n) {
    char* p = static_cast<char*>(buf);
    while (n) {
      ssize_t r = read(from_child_, p, n);
      if (r <= 0) throw std::runtime_error("worker pipe read failed");
      p += r;
      n -= r;
    }
  }

  pid_t pid_ = -1;
  int to_child_ = -1, from_child_ = -1;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_SUBPROCESS_ASR_MODEL_H_
