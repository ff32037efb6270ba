// See header. Recognizer bundles feature pipeline + shared resource +
// lazily-built decoder with per-call context graph (capability parity with
// reference runtime/core/api/wenet_api.cc:29-101).
#include "api/wenet_api.h"

#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "decoder/asr_decoder.h"
#include "decoder/subprocess_asr_model.h"
#include "utils/string.h"

namespace wenet_tpu {

class Recognizer {
 public:
  explicit Recognizer(const std::string& model_dir)
      : num_bins_(ReadNumBins(model_dir)) {
    symbol_table_ =
        std::make_shared<std::unordered_map<int, std::string>>();
    {
      std::ifstream in(model_dir + "/units.txt");
      std::string sym;
      int id;
      while (in >> sym >> id) {
        (*symbol_table_)[id] = sym;
        sym_to_id_[sym] = id;
      }
    }
    std::string worker_cmd;
    {
      std::ifstream in(model_dir + "/worker_cmd.txt");
      std::getline(in, worker_cmd);
    }
    std::vector<std::string> argv;
    std::stringstream ss(worker_cmd);
    std::string tok;
    while (ss >> tok) argv.push_back(tok);
    model_ = std::make_shared<SubprocessAsrModel>(argv);
    resource_ = std::make_shared<DecodeResource>();
    resource_->model = model_;
    resource_->symbol_table = symbol_table_;
    resource_->post_processor = std::make_shared<PostProcessor>();
    // Optional LG decoding graph (reference wenet_api.cc:38-63 loads an
    // optional TLG.fst + words.txt from the model dir).
    {
      auto fst = std::make_shared<LgFst>();
      if (fst->Read(model_dir + "/lg.bin")) {
        resource_->fst = fst;
        opts_.search_type = SearchType::kWfstBeamSearch;
        auto words = std::make_shared<
            std::unordered_map<int, std::string>>();
        std::ifstream in(model_dir + "/words.txt");
        std::string sym;
        int id;
        while (in >> sym >> id) (*words)[id] = sym;
        if (!words->empty()) resource_->symbol_table = words;
      }
    }
  }

  void InitDecoderIfNeeded() {
    if (decoder_) return;
    if (!context_.empty()) {
      ContextConfig cfg;
      cfg.context_score = context_score_;
      auto graph = std::make_shared<ContextGraph>(cfg);
      std::vector<std::vector<int>> ids;
      for (const auto& w : context_) ids.push_back(TokenizeWord(w));
      graph->Build(ids);
      resource_->context_graph = graph;
    }
    feature_pipeline_ = std::make_shared<FeaturePipeline>(
        FeaturePipelineConfig(num_bins_, 16000));
    opts_.chunk_size = chunk_size_;
    decoder_.reset(new AsrDecoder(feature_pipeline_, resource_, opts_));
  }

  // Mel-bin count from the model dir's train.yaml (the training CLI
  // always serializes dataset_conf.fbank_conf.num_mel_bins); default 80
  // (reference wenet_api.cc hardcodes 80 — here the model dir is the
  // contract).
  static int ReadNumBins(const std::string& model_dir) {
    std::ifstream in(model_dir + "/train.yaml");
    std::string line;
    while (std::getline(in, line)) {
      size_t pos = line.find("num_mel_bins:");
      if (pos != std::string::npos) {
        return std::atoi(line.c_str() + pos + strlen("num_mel_bins:"));
      }
    }
    return 80;
  }

  // Greedy longest-match word-piece tokenization against the symbol table
  // ("▁" marks word starts, CJK chars map singly).
  std::vector<int> TokenizeWord(const std::string& word) {
    std::vector<int> out;
    std::string marked = std::string(kSpaceSymbol) + word;
    size_t i = 0;
    while (i < marked.size()) {
      size_t best_len = 0;
      int best_id = -1;
      for (size_t l = marked.size() - i; l >= 1; --l) {
        auto it = sym_to_id_.find(marked.substr(i, l));
        if (it != sym_to_id_.end()) {
          best_len = l;
          best_id = it->second;
          break;
        }
      }
      if (best_id < 0) {
        i += UTF8CharLength(static_cast<unsigned char>(marked[i]));
      } else {
        out.push_back(best_id);
        i += best_len;
      }
    }
    return out;
  }

  void Decode(const char* data, int len, int last) {
    InitDecoderIfNeeded();
    int n = len / 2;
    const int16_t* pcm = reinterpret_cast<const int16_t*>(data);
    std::vector<float> wav(n);
    for (int i = 0; i < n; ++i) wav[i] = static_cast<float>(pcm[i]);
    feature_pipeline_->AcceptWaveform(wav);
    if (last) feature_pipeline_->set_input_finished();
    while (true) {
      DecodeState state = decoder_->Decode();
      if (state == DecodeState::kEndFeats) {
        decoder_->Rescoring();
        UpdateResult(true);
        break;
      } else if (state == DecodeState::kEndpoint) {
        decoder_->Rescoring();
        UpdateResult(true);
        if (continuous_decoding_) {
          decoder_->ResetContinuousDecoding();
        } else {
          break;
        }
      } else {
        UpdateResult(false);
        // More buffered chunks remain (kEndBatch): with input finished we
        // must drain them to reach kEndFeats; mid-stream we return the
        // partial result to the caller.
        if (!last) break;
      }
    }
  }

  void UpdateResult(bool is_final) {
    std::stringstream ss;
    ss << "{\"type\":\"" << (is_final ? "final" : "partial")
       << "\",\"nbest\":[";
    const auto& results = decoder_->result();
    int n = std::min<int>(nbest_, results.size());
    for (int i = 0; i < n; ++i) {
      if (i) ss << ",";
      ss << "{\"sentence\":\"" << results[i].sentence << "\"";
      if (enable_timestamp_) {
        ss << ",\"word_pieces\":[";
        for (size_t j = 0; j < results[i].word_pieces.size(); ++j) {
          const auto& wp = results[i].word_pieces[j];
          if (j) ss << ",";
          ss << "{\"word\":\"" << wp.word << "\",\"start\":" << wp.start
             << ",\"end\":" << wp.end << "}";
        }
        ss << "]";
      }
      ss << "}";
    }
    ss << "]}";
    result_ = ss.str();
  }

  void Reset() {
    if (decoder_) decoder_->Reset();
    result_.clear();
  }

  const std::string& result() const { return result_; }

  int nbest_ = 1;
  bool enable_timestamp_ = false;
  std::vector<std::string> context_;
  float context_score_ = 3.0f;
  bool continuous_decoding_ = false;
  int chunk_size_ = 16;
  int num_bins_ = 80;

 private:
  std::shared_ptr<std::unordered_map<int, std::string>> symbol_table_;
  std::unordered_map<std::string, int> sym_to_id_;
  std::shared_ptr<SubprocessAsrModel> model_;
  std::shared_ptr<DecodeResource> resource_;
  std::shared_ptr<FeaturePipeline> feature_pipeline_;
  std::unique_ptr<AsrDecoder> decoder_;
  DecodeOptions opts_;
  std::string result_;
};

}  // namespace wenet_tpu

using wenet_tpu::Recognizer;

void* wenet_init(const char* model_dir) {
  try {
    return new Recognizer(model_dir);
  } catch (...) {
    return nullptr;
  }
}

void wenet_free(void* decoder) {
  delete static_cast<Recognizer*>(decoder);
}

void wenet_reset(void* decoder) { static_cast<Recognizer*>(decoder)->Reset(); }

const char* wenet_decode(void* decoder, const char* data, int len,
                         int last) {
  auto* r = static_cast<Recognizer*>(decoder);
  r->Decode(data, len, last);
  return r->result().c_str();
}

const char* wenet_get_result(void* decoder) {
  return static_cast<Recognizer*>(decoder)->result().c_str();
}

void wenet_set_nbest(void* decoder, int n) {
  static_cast<Recognizer*>(decoder)->nbest_ = n;
}

void wenet_set_timestamp(void* decoder, int flag) {
  static_cast<Recognizer*>(decoder)->enable_timestamp_ = flag != 0;
}

void wenet_add_context(void* decoder, const char* word) {
  static_cast<Recognizer*>(decoder)->context_.emplace_back(word);
}

void wenet_set_context_score(void* decoder, float score) {
  static_cast<Recognizer*>(decoder)->context_score_ = score;
}

void wenet_set_continuous_decoding(void* decoder, int flag) {
  static_cast<Recognizer*>(decoder)->continuous_decoding_ = flag != 0;
}

void wenet_set_chunk_size(void* decoder, int chunk_size) {
  static_cast<Recognizer*>(decoder)->chunk_size_ = chunk_size;
}
