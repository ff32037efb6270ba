// Hypothesis text post-processing: word-piece markers → spaces, Mandarin/
// English mixed spacing, lowercase option.
// Capability parity with reference
// runtime/core/post_processor/post_processor.{h,cc}:24-62.
#ifndef WENET_TPU_POST_PROCESSOR_POST_PROCESSOR_H_
#define WENET_TPU_POST_PROCESSOR_POST_PROCESSOR_H_

#include <string>
#include <vector>

#include "utils/string.h"

namespace wenet_tpu {

enum class LanguageType {
  kMandarinEnglish = 0,  // CJK chars joined, latin words space-separated
  kIndoEuropean = 1,     // all tokens space-separated
};

struct PostProcessOptions {
  LanguageType language_type = LanguageType::kMandarinEnglish;
  bool lowercase = true;
};

class PostProcessor {
 public:
  explicit PostProcessor(PostProcessOptions opts = PostProcessOptions())
      : opts_(opts) {}

  // sentence: concatenated symbols (may contain "▁" markers).
  std::string ProcessSpace(const std::string& sentence) const {
    std::string processed = ProcessBlank(sentence, opts_.lowercase);
    if (opts_.language_type == LanguageType::kIndoEuropean)
      return processed;
    // Mandarin/English mix: ensure spaces only between latin words; CJK
    // characters attach directly.
    std::vector<std::string> chars;
    SplitUTF8StringToChars(processed, &chars);
    std::string result;
    for (size_t i = 0; i < chars.size(); ++i) {
      if (chars[i] == " ") {
        // keep the space only if both neighbors are latin
        bool prev_latin = i > 0 && IsAlpha(chars[i - 1]);
        bool next_latin = i + 1 < chars.size() && IsAlpha(chars[i + 1]);
        if (prev_latin && next_latin) result += ' ';
      } else {
        result += chars[i];
      }
    }
    return result;
  }

  std::string Process(const std::string& sentence, bool finish) const {
    // itn/punctuation hooks would go here (reference TODO :62).
    (void)finish;
    return ProcessSpace(sentence);
  }

 private:
  PostProcessOptions opts_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_POST_PROCESSOR_POST_PROCESSOR_H_
