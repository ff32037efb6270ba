// Streaming ASR RPC server over length-prefixed protobuf frames on TCP.
// Capability parity with reference runtime/core/grpc/grpc_server.{h,cc}
// (bidi-streaming Recognize: DecodeConfig first, then PCM chunks; responses
// server_ready / partial_result / final_result / speech_end with nbest +
// word pieces) — transport redesigned because gRPC/HTTP2 is unavailable:
// each frame is [u32 big-endian length][serialized message].
#ifndef WENET_TPU_GRPC_RPC_SERVER_H_
#define WENET_TPU_GRPC_RPC_SERVER_H_

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

#include "decoder/asr_decoder.h"
#include "grpc/wenet_rpc.pb.h"

namespace wenet_tpu {
namespace rpc {

inline bool ReadExact(int fd, char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = ::read(fd, buf + got, n - got);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

inline bool ReadFrame(int fd, std::string* out) {
  char hdr[4];
  if (!ReadExact(fd, hdr, 4)) return false;
  uint32_t len = (static_cast<uint32_t>(static_cast<uint8_t>(hdr[0])) << 24)
      | (static_cast<uint32_t>(static_cast<uint8_t>(hdr[1])) << 16)
      | (static_cast<uint32_t>(static_cast<uint8_t>(hdr[2])) << 8)
      | static_cast<uint32_t>(static_cast<uint8_t>(hdr[3]));
  if (len > (64u << 20)) return false;  // sanity cap
  out->resize(len);
  return len == 0 || ReadExact(fd, &(*out)[0], len);
}

inline bool WriteFrame(int fd, const std::string& payload) {
  uint32_t len = static_cast<uint32_t>(payload.size());
  char hdr[4] = {static_cast<char>(len >> 24), static_cast<char>(len >> 16),
                 static_cast<char>(len >> 8), static_cast<char>(len)};
  if (::write(fd, hdr, 4) != 4) return false;
  size_t sent = 0;
  while (sent < payload.size()) {
    ssize_t w = ::write(fd, payload.data() + sent, payload.size() - sent);
    if (w <= 0) return false;
    sent += static_cast<size_t>(w);
  }
  return true;
}

class RpcConnectionHandler {
 public:
  RpcConnectionHandler(int fd, std::shared_ptr<DecodeResource> resource,
                       DecodeOptions opts, int num_bins = 80,
                       int sample_rate = 16000)
      : fd_(fd), resource_(std::move(resource)), opts_(opts),
        num_bins_(num_bins), sample_rate_(sample_rate) {}

  void operator()() {
    std::string frame;
    while (ReadFrame(fd_, &frame)) {
      Request req;
      if (!req.ParseFromString(frame)) break;
      if (req.has_decode_config()) {
        if (req.decode_config().nbest_config() > 0) {
          nbest_ = req.decode_config().nbest_config();
        }
        continuous_ = req.decode_config().continuous_decoding_config();
        OnSpeechStart();
      } else {
        if (req.audio_data().empty()) {  // explicit end-of-input frame
          OnSpeechEnd();
          break;
        }
        OnSpeechData(req.audio_data());
      }
    }
    OnSpeechEnd();  // EOF without an end frame also finishes the stream
    if (decode_thread_ && decode_thread_->joinable()) decode_thread_->join();
    close(fd_);
  }

 private:
  void OnSpeechStart() {
    feature_pipeline_ = std::make_shared<FeaturePipeline>(
        FeaturePipelineConfig(num_bins_, sample_rate_));
    decoder_.reset(new AsrDecoder(feature_pipeline_, resource_, opts_));
    decode_thread_.reset(
        new std::thread(&RpcConnectionHandler::DecodeThreadFunc, this));
    Response resp;
    resp.set_status(Response::ok);
    resp.set_type(Response::server_ready);
    Send(resp);
  }

  void OnSpeechData(const std::string& payload) {
    if (!feature_pipeline_) return;
    int n = static_cast<int>(payload.size()) / 2;
    const int16_t* pcm = reinterpret_cast<const int16_t*>(payload.data());
    std::vector<float> wav(n);
    for (int i = 0; i < n; ++i) wav[i] = static_cast<float>(pcm[i]);
    feature_pipeline_->AcceptWaveform(wav);
  }

  void OnSpeechEnd() {
    if (feature_pipeline_) feature_pipeline_->set_input_finished();
  }

  void DecodeThreadFunc() {
    while (true) {
      DecodeState state = decoder_->Decode();
      if (state == DecodeState::kEndFeats) {
        decoder_->Rescoring();
        SendResult(Response::final_result);
        Response done;
        done.set_status(Response::ok);
        done.set_type(Response::speech_end);
        Send(done);
        break;
      } else if (state == DecodeState::kEndpoint && continuous_) {
        decoder_->Rescoring();
        SendResult(Response::final_result);
        decoder_->ResetContinuousDecoding();
      } else if (decoder_->DecodedSomething()) {
        SendResult(Response::partial_result);
      }
    }
  }

  void SendResult(Response::Type type) {
    Response resp;
    resp.set_status(Response::ok);
    resp.set_type(type);
    const auto& results = decoder_->result();
    for (size_t i = 0; i < results.size()
         && i < static_cast<size_t>(nbest_); ++i) {
      auto* best = resp.add_nbest();
      best->set_sentence(results[i].sentence);
      if (type == Response::final_result) {
        for (const auto& wp : results[i].word_pieces) {
          auto* piece = best->add_wordpieces();
          piece->set_word(wp.word);
          piece->set_start(wp.start);
          piece->set_end(wp.end);
        }
      }
    }
    Send(resp);
  }

  void Send(const Response& resp) {
    std::lock_guard<std::mutex> lock(send_mutex_);
    WriteFrame(fd_, resp.SerializeAsString());
  }

  int fd_;
  std::shared_ptr<DecodeResource> resource_;
  DecodeOptions opts_;
  int num_bins_;
  int sample_rate_;
  int nbest_ = 1;
  bool continuous_ = false;
  std::shared_ptr<FeaturePipeline> feature_pipeline_;
  std::unique_ptr<AsrDecoder> decoder_;
  std::unique_ptr<std::thread> decode_thread_;
  std::mutex send_mutex_;
};

class RpcServer {
 public:
  RpcServer(int port, std::shared_ptr<DecodeResource> resource,
            DecodeOptions opts, int num_bins = 80, int sample_rate = 16000)
      : port_(port), resource_(std::move(resource)), opts_(opts),
        num_bins_(num_bins), sample_rate_(sample_rate) {}

  void Start(int max_connections = -1) {
    int server_fd = socket(AF_INET, SOCK_STREAM, 0);
    int on = 1;
    setsockopt(server_fd, SOL_SOCKET, SO_REUSEADDR, &on, sizeof(on));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = INADDR_ANY;
    addr.sin_port = htons(port_);
    if (bind(server_fd, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) != 0 ||
        listen(server_fd, 8) != 0) {
      close(server_fd);
      throw std::runtime_error("rpc bind/listen failed");
    }
    int served = 0;
    std::vector<std::thread> threads;
    while (max_connections < 0 || served < max_connections) {
      int client = accept(server_fd, nullptr, nullptr);
      if (client < 0) break;
      auto handler = std::make_shared<RpcConnectionHandler>(
          client, resource_, opts_, num_bins_, sample_rate_);
      threads.emplace_back([handler] { (*handler)(); });
      ++served;
    }
    for (auto& t : threads) t.join();
    close(server_fd);
  }

 private:
  int port_;
  std::shared_ptr<DecodeResource> resource_;
  DecodeOptions opts_;
  int num_bins_;
  int sample_rate_;
};

}  // namespace rpc
}  // namespace wenet_tpu

#endif  // WENET_TPU_GRPC_RPC_SERVER_H_
