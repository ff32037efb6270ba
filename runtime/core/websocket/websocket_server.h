// Streaming ASR WebSocket server.
// Capability parity with reference runtime/core/websocket/websocket_server
// (JSON signaling start/end, binary PCM16 frames, per-connection decode
// thread, partial/final results — `websocket_server.cc:33-120`), built on
// the dependency-free websocket.h instead of boost.beast.
#ifndef WENET_TPU_WEBSOCKET_WEBSOCKET_SERVER_H_
#define WENET_TPU_WEBSOCKET_WEBSOCKET_SERVER_H_

#include <atomic>
#include <memory>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "decoder/asr_decoder.h"
#include "websocket/websocket.h"

namespace wenet_tpu {

class ConnectionHandler {
 public:
  ConnectionHandler(int fd, std::shared_ptr<DecodeResource> resource,
                    DecodeOptions opts, int num_bins = 80,
                    int sample_rate = 16000)
      : fd_(fd), resource_(std::move(resource)), opts_(opts),
        num_bins_(num_bins), sample_rate_(sample_rate) {}

  void operator()() {
    if (!ws::ServerHandshake(fd_)) {
      close(fd_);
      return;
    }
    ws::Opcode op;
    std::string payload;
    while (ws::ReadMessage(fd_, &op, &payload)) {
      if (op == ws::kText) {
        if (payload.find("start") != std::string::npos) {
          OnSpeechStart();
        } else if (payload.find("end") != std::string::npos) {
          OnSpeechEnd();
          break;
        }
      } else if (op == ws::kBinary) {
        OnSpeechData(payload);
      } else if (op == ws::kClose) {
        break;
      }
    }
    if (decode_thread_ && decode_thread_->joinable()) {
      if (feature_pipeline_) feature_pipeline_->set_input_finished();
      decode_thread_->join();
    }
    close(fd_);
  }

 private:
  void OnSpeechStart() {
    feature_pipeline_ = std::make_shared<FeaturePipeline>(
        FeaturePipelineConfig(num_bins_, sample_rate_));
    decoder_.reset(new AsrDecoder(feature_pipeline_, resource_, opts_));
    decode_thread_.reset(
        new std::thread(&ConnectionHandler::DecodeThreadFunc, this));
    Send("{\"status\":\"ok\",\"type\":\"server_ready\"}");
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
        Send(ResultJson("final_result"));
        Send("{\"status\":\"ok\",\"type\":\"speech_end\"}");
        break;
      } else if (state == DecodeState::kEndpoint) {
        decoder_->Rescoring();
        Send(ResultJson("final_result"));
        decoder_->ResetContinuousDecoding();
      } else if (decoder_->DecodedSomething()) {
        Send(ResultJson("partial_result"));
      }
    }
  }

  std::string ResultJson(const char* type) {
    std::ostringstream ss;
    ss << "{\"status\":\"ok\",\"type\":\"" << type << "\",\"nbest\":[";
    const auto& results = decoder_->result();
    for (size_t i = 0; i < results.size() && i < 1; ++i) {
      ss << "{\"sentence\":\"" << results[i].sentence << "\"}";
    }
    ss << "]}";
    return ss.str();
  }

  void Send(const std::string& text) {
    std::lock_guard<std::mutex> lock(send_mutex_);
    ws::WriteMessage(fd_, ws::kText, text);
  }

  int fd_;
  std::shared_ptr<DecodeResource> resource_;
  DecodeOptions opts_;
  int num_bins_;
  int sample_rate_;
  std::shared_ptr<FeaturePipeline> feature_pipeline_;
  std::unique_ptr<AsrDecoder> decoder_;
  std::unique_ptr<std::thread> decode_thread_;
  std::mutex send_mutex_;
};

class WebSocketServer {
 public:
  WebSocketServer(int port, std::shared_ptr<DecodeResource> resource,
                  DecodeOptions opts, int num_bins = 80,
                  int sample_rate = 16000)
      : port_(port), resource_(std::move(resource)), opts_(opts),
        num_bins_(num_bins), sample_rate_(sample_rate) {}

  // Serves until the process exits (or max_connections reached, for tests).
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
      throw std::runtime_error("websocket bind/listen failed");
    }
    int served = 0;
    std::vector<std::thread> threads;
    while (max_connections < 0 || served < max_connections) {
      int client = accept(server_fd, nullptr, nullptr);
      if (client < 0) break;
      auto handler = std::make_shared<ConnectionHandler>(
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

}  // namespace wenet_tpu

#endif  // WENET_TPU_WEBSOCKET_WEBSOCKET_SERVER_H_
