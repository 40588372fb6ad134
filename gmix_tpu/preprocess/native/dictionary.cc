// Native engine for the word-replacing dictionary transform.
//
// Behavioural equivalent of the reference preprocessor
// (src/preprocess/dictionary.cpp), re-implemented buffer-to-buffer with a C
// ABI for ctypes loading: word codes in 80/3840/40960 frequency bands,
// capitalisation escapes, the &quot; token, byte escaping, and longest
// suffix/prefix fallback for unknown words >= 8 chars.
//
// Build: g++ -std=c++17 -O2 -fPIC -shared dictionary.cc -o libgmixdict.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint8_t kCapitalized = 0x40;
constexpr uint8_t kUppercase = 0x07;
constexpr uint8_t kEndUpper = 0x06;
constexpr uint8_t kEscape = 0x0C;
constexpr uint8_t kQuote = 0x08;
const char kQuoteStr[] = "&quot;";

constexpr int kB1 = 80;
constexpr int kB2 = kB1 + 3840;
constexpr int kB3 = kB2 + 40960;
constexpr int kB4 = kB3 + 81920;

struct Sink {
  uint8_t* buf;
  size_t cap;
  size_t len = 0;
  bool overflow = false;
  void put(uint8_t c) {
    if (len < cap) buf[len++] = c;
    else overflow = true;
  }
  void put_str(const std::string& s) {
    for (char c : s) put(static_cast<uint8_t>(c));
  }
};

struct Dict {
  std::unordered_map<std::string, std::string> byte_map;
  std::unordered_map<std::string, std::string> reverse_map;
  size_t longest = 0;

  explicit Dict(const uint8_t* data, size_t n) {
    std::string line;
    int count = 0;
    for (size_t i = 0; i <= n; ++i) {
      uint8_t c = i < n ? data[i] : '\n';
      if (c >= 'a' && c <= 'z') {
        line += static_cast<char>(c);
      } else if (!line.empty()) {
        if (line.size() > longest) longest = line.size();
        std::string code = word_code(count);
        byte_map[line] = code;
        reverse_map[code] = line;
        ++count;
        line.clear();
      }
    }
  }

  static std::string word_code(int i) {
    std::string out;
    if (i < kB1) {
      out.push_back(static_cast<char>(0x80 + i));
    } else if (i < kB2) {
      int j = i - kB1;
      out.push_back(static_cast<char>(0xD0 + j / 80));
      out.push_back(static_cast<char>(0x80 + j % 80));
    } else if (i < kB3) {
      int j = i - kB2;
      out.push_back(static_cast<char>(0xF0 + (j / 80) / 32));
      out.push_back(static_cast<char>(0xD0 + (j / 80) % 32));
      out.push_back(static_cast<char>(0x80 + j % 80));
    } else if (i < kB4) {
      int j = i - kB2;
      out.push_back(static_cast<char>(0xD0 + (j / 80) / 32));
      out.push_back(static_cast<char>(0xD0 + (j / 80) % 32));
      out.push_back(static_cast<char>(0x80 + j % 80));
    }
    return out;
  }

  void emit_byte(uint8_t c, Sink& out) const {
    if (c == kEndUpper || c == kEscape || c == kUppercase ||
        c == kCapitalized || c == kQuote || c >= 0x80) {
      out.put(kEscape);
    }
    out.put(c);
  }

  bool emit_substring(const std::string& word, Sink& out) const {
    if (word.size() <= 7) return false;
    size_t size = word.size() - 1;
    if (size > longest) size = longest;
    std::string suffix = word.substr(word.size() - size, size);
    while (suffix.size() >= 7) {
      auto it = byte_map.find(suffix);
      if (it != byte_map.end()) {
        for (size_t i = 0; i < word.size() - suffix.size(); ++i) {
          out.put(static_cast<uint8_t>(word[i]));
        }
        out.put_str(it->second);
        return true;
      }
      suffix.erase(0, 1);
    }
    std::string prefix = word.substr(0, size);
    while (prefix.size() >= 7) {
      auto it = byte_map.find(prefix);
      if (it != byte_map.end()) {
        out.put_str(it->second);
        for (size_t i = prefix.size(); i < word.size(); ++i) {
          out.put(static_cast<uint8_t>(word[i]));
        }
        return true;
      }
      prefix.erase(prefix.size() - 1, 1);
    }
    return false;
  }

  void emit_word(const std::string& word, int num_upper, bool next_lower,
                 Sink& out) const {
    if (num_upper > 1) out.put(kUppercase);
    else if (num_upper == 1) out.put(kCapitalized);
    auto it = byte_map.find(word);
    if (it != byte_map.end()) {
      out.put_str(it->second);
    } else if (!emit_substring(word, out)) {
      out.put_str(word);
    }
    if (num_upper > 1 && next_lower) out.put(kEndUpper);
  }

  void encode(const uint8_t* in, size_t n, Sink& out) const {
    std::string word;
    int num_upper = 0, num_lower = 0, quote_state = 0;
    for (size_t pos = 0; pos < n; ++pos) {
      uint8_t c = in[pos];
      if (c == static_cast<uint8_t>(kQuoteStr[quote_state])) {
        ++quote_state;
        if (quote_state == 6) {
          out.put(kQuote);
          num_upper = num_lower = 0;
          word.clear();
          quote_state = 0;
          continue;
        }
      } else {
        quote_state = 0;
      }
      bool advance = false;
      if (word.size() > longest) {
        advance = true;
      } else if (c >= 'a' && c <= 'z') {
        if (num_upper > 1) advance = true;
        else { ++num_lower; word += static_cast<char>(c); }
      } else if (c >= 'A' && c <= 'Z') {
        if (num_lower > 0) advance = true;
        else { ++num_upper; word += static_cast<char>(c - 'A' + 'a'); }
      } else {
        advance = true;
      }
      if (pos == n - 1 && !advance) emit_word(word, num_upper, false, out);
      if (advance) {
        if (word.empty()) {
          emit_byte(c, out);
        } else {
          bool next_lower = (c >= 'a' && c <= 'z');
          emit_word(word, num_upper, next_lower, out);
          num_lower = num_upper = 0;
          word.clear();
          if (next_lower) {
            ++num_lower;
            word += static_cast<char>(c);
          } else if (c >= 'A' && c <= 'Z') {
            ++num_upper;
            word += static_cast<char>(c - 'A' + 'a');
          } else {
            emit_byte(c, out);
          }
          if (pos == n - 1 && !word.empty()) {
            emit_word(word, num_upper, false, out);
          }
        }
      }
    }
  }

  void decode(const uint8_t* in, size_t n, Sink& out) const {
    bool upper = false, capital = false;
    size_t i = 0;
    while (i < n) {
      uint8_t c = in[i++];
      if (c == kEscape) {
        upper = false;
        if (i < n) out.put(in[i++]);
      } else if (c == kQuote) {
        for (int k = 1; k < 6; ++k) out.put(static_cast<uint8_t>(kQuoteStr[k]));
      } else if (c == kUppercase) {
        upper = true;
      } else if (c == kCapitalized) {
        capital = true;
      } else if (c == kEndUpper) {
        upper = false;
      } else if (c >= 0x80) {
        std::string code(1, static_cast<char>(c));
        if (c > 0xCF && i < n) {
          uint8_t c2 = in[i++];
          code.push_back(static_cast<char>(c2));
          if (c2 > 0xCF && i < n) code.push_back(static_cast<char>(in[i++]));
        }
        auto it = reverse_map.find(code);
        if (it != reverse_map.end()) {
          std::string word = it->second;
          for (size_t k = 0; k < word.size(); ++k) {
            char wc = word[k];
            if (k == 0 && capital) { wc = wc - 'a' + 'A'; capital = false; }
            if (upper) wc = wc - 'a' + 'A';
            out.put(static_cast<uint8_t>(wc));
          }
        }
      } else {
        if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) upper = false;
        if (capital || upper) c = c - 'a' + 'A';
        if (capital) capital = false;
        out.put(c);
      }
    }
  }
};

}  // namespace

extern "C" {

void* gd_new(const char* dict_data, size_t len) {
  return new Dict(reinterpret_cast<const uint8_t*>(dict_data), len);
}

void gd_free(void* h) { delete static_cast<Dict*>(h); }

long long gd_encode(void* h, const char* in, size_t n, char* out, size_t cap) {
  Sink sink{reinterpret_cast<uint8_t*>(out), cap};
  static_cast<Dict*>(h)->encode(reinterpret_cast<const uint8_t*>(in), n, sink);
  return sink.overflow ? -1 : static_cast<long long>(sink.len);
}

long long gd_decode(void* h, const char* in, size_t n, char* out, size_t cap) {
  Sink sink{reinterpret_cast<uint8_t*>(out), cap};
  static_cast<Dict*>(h)->decode(reinterpret_cast<const uint8_t*>(in), n, sink);
  return sink.overflow ? -1 : static_cast<long long>(sink.len);
}

}  // extern "C"
