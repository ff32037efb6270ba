// UTF-8 string helpers.
// Capability parity with reference runtime/core/utils/string.h:42-64
// (SplitUTF8StringToChars, CheckEnglishWord, ProcessBlank for the "▁"
// word-piece marker).
#ifndef WENET_TPU_UTILS_STRING_H_
#define WENET_TPU_UTILS_STRING_H_

#include <string>
#include <vector>

namespace wenet_tpu {

const char kSpaceSymbol[] = "\xe2\x96\x81";  // "▁"

inline int UTF8CharLength(unsigned char c) {
  if (c < 0x80) return 1;
  if ((c & 0xE0) == 0xC0) return 2;
  if ((c & 0xF0) == 0xE0) return 3;
  if ((c & 0xF8) == 0xF0) return 4;
  return 1;  // invalid byte: treat as single char
}

inline void SplitUTF8StringToChars(const std::string& str,
                                   std::vector<std::string>* chars) {
  chars->clear();
  size_t i = 0;
  while (i < str.size()) {
    int len = UTF8CharLength(static_cast<unsigned char>(str[i]));
    if (i + len > str.size()) len = 1;
    chars->push_back(str.substr(i, len));
    i += len;
  }
}

inline bool IsAlpha(const std::string& ch) {
  return ch.size() == 1 &&
         ((ch[0] >= 'a' && ch[0] <= 'z') || (ch[0] >= 'A' && ch[0] <= 'Z') ||
          (ch[0] >= '0' && ch[0] <= '9') || ch[0] == '\'');
}

inline bool CheckEnglishWord(const std::string& word) {
  std::vector<std::string> chars;
  SplitUTF8StringToChars(word, &chars);
  for (const auto& c : chars) {
    if (!IsAlpha(c)) return false;
  }
  return !chars.empty();
}

inline void SplitString(const std::string& str,
                        std::vector<std::string>* out) {
  out->clear();
  std::string cur;
  for (char c : str) {
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      if (!cur.empty()) {
        out->push_back(cur);
        cur.clear();
      }
    } else {
      cur += c;
    }
  }
  if (!cur.empty()) out->push_back(cur);
}

// Replace word-piece "▁" markers with spaces; optionally lowercase.
inline std::string ProcessBlank(const std::string& str, bool lowercase) {
  std::string result;
  size_t i = 0;
  while (i < str.size()) {
    if (str.compare(i, 3, kSpaceSymbol) == 0) {
      if (!result.empty() && result.back() != ' ') result += ' ';
      i += 3;
    } else {
      char c = str[i];
      if (lowercase && c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
      result += c;
      ++i;
    }
  }
  // Trim leading/trailing spaces.
  size_t b = result.find_first_not_of(' ');
  if (b == std::string::npos) return "";
  size_t e = result.find_last_not_of(' ');
  return result.substr(b, e - b + 1);
}

}  // namespace wenet_tpu

#endif  // WENET_TPU_UTILS_STRING_H_
