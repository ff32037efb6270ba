// C++ runtime unit tests. Mirrors the reference's test set
// (runtime/core/test/*): prefix-beam golden values, BlockingQueue
// concurrency, post-processor space rules, TopK — plus FFT-vs-DFT and
// endpoint rules.
#include <cmath>
#include <thread>
#include <vector>

#include "decoder/context_graph.h"
#include "decoder/ctc_endpoint.h"
#include "decoder/ctc_prefix_beam_search.h"
#include "frontend/fbank.h"
#include "frontend/fft.h"
#include "post_processor/post_processor.h"
#include "test/mini_test.h"
#include "utils/blocking_queue.h"
#include "utils/string.h"
#include "utils/thread_pool.h"
#include "utils/utils.h"
#include "websocket/websocket.h"

using namespace wenet_tpu;

TEST(Utils, TopK) {
  std::vector<float> data = {1.0f, 5.0f, 3.0f, 2.0f, 4.0f};
  std::vector<float> values;
  std::vector<int> indices;
  TopK(data, 3, &values, &indices);
  EXPECT_EQ(indices[0], 1);
  EXPECT_EQ(indices[1], 4);
  EXPECT_EQ(indices[2], 2);
  EXPECT_FLOAT_EQ(values[0], 5.0f);
}

TEST(Utils, LogAdd) {
  float r = LogAdd(std::log(0.3f), std::log(0.2f));
  EXPECT_NEAR(std::exp(r), 0.5, 1e-6);
  EXPECT_FLOAT_EQ(LogAdd(kLogZero, std::log(0.5f)), std::log(0.5f));
}

TEST(BlockingQueue, ProducerConsumer) {
  BlockingQueue<int> q(4);
  std::vector<int> got;
  std::thread consumer([&] {
    for (int i = 0; i < 100; ++i) got.push_back(q.Pop());
  });
  std::thread producer([&] {
    for (int i = 0; i < 100; ++i) q.Push(i);
  });
  producer.join();
  consumer.join();
  ASSERT_TRUE(got.size() == 100);
  for (int i = 0; i < 100; ++i) EXPECT_EQ(got[i], i);
  EXPECT_TRUE(q.Empty());
}

TEST(ThreadPool, ParallelSum) {
  ThreadPool pool(4);
  std::vector<std::future<int>> futs;
  for (int i = 0; i < 32; ++i)
    futs.push_back(pool.enqueue([i] { return i * i; }));
  int total = 0;
  for (auto& f : futs) total += f.get();
  EXPECT_EQ(total, 10416);  // sum i^2, i<32
}

TEST(String, SplitUTF8AndProcessBlank) {
  std::vector<std::string> chars;
  SplitUTF8StringToChars("a中b", &chars);
  ASSERT_TRUE(chars.size() == 3);
  EXPECT_EQ(chars[1], std::string("\xe4\xb8\xad"));
  EXPECT_EQ(ProcessBlank("\xe2\x96\x81HELLO\xe2\x96\x81WORLD", true),
            std::string("hello world"));
}

TEST(PostProcessor, SpaceRules) {
  PostProcessor pp({LanguageType::kMandarinEnglish, true});
  // latin words keep a space, CJK attaches.
  EXPECT_EQ(pp.ProcessSpace("\xe2\x96\x81HI\xe2\x96\x81YOU"),
            std::string("hi you"));
  EXPECT_EQ(pp.ProcessSpace("\xe4\xbd\xa0\xe5\xa5\xbd\xe2\x96\x81OK"),
            std::string("\xe4\xbd\xa0\xe5\xa5\xbd"
                        "ok"));
}

TEST(Fft, MatchesNaiveDft) {
  const int n = 16;
  Fft fft(n);
  std::vector<float> re(n), im(n, 0.0f);
  for (int i = 0; i < n; ++i) re[i] = std::sin(0.3f * i) + 0.1f * i;
  std::vector<float> re0(re), im0(im);
  fft.Transform(re.data(), im.data());
  for (int k = 0; k < n; ++k) {
    double sr = 0, si = 0;
    for (int t = 0; t < n; ++t) {
      double ang = -2.0 * M_PI * k * t / n;
      sr += re0[t] * std::cos(ang) - im0[t] * std::sin(ang);
      si += re0[t] * std::sin(ang) + im0[t] * std::cos(ang);
    }
    EXPECT_NEAR(re[k], sr, 1e-3);
    EXPECT_NEAR(im[k], si, 1e-3);
  }
}

TEST(Fbank, FrameCountAndEnergies) {
  Fbank fbank(23, 16000, 400, 160);
  std::vector<float> wave(16000);
  for (size_t i = 0; i < wave.size(); ++i)
    wave[i] = 10000.0f * std::sin(2.0 * M_PI * 1000.0 * i / 16000.0);
  std::vector<std::vector<float>> feat;
  int n = fbank.Compute(wave, &feat);
  EXPECT_EQ(n, 1 + (16000 - 400) / 160);
  ASSERT_TRUE(!feat.empty());
  EXPECT_EQ(static_cast<int>(feat[0].size()), 23);
  // Energy concentrated in one bin → max much larger than min.
  float mx = -1e30f, mn = 1e30f;
  for (float v : feat[5]) {
    mx = std::max(mx, v);
    mn = std::min(mn, v);
  }
  EXPECT_TRUE(mx - mn > 5.0f);
}

TEST(CtcPrefixBeamSearch, GoldenLogicTest) {
  // The reference's hand-computed 3x3 test
  // (ctc_prefix_beam_search_test.cc:26-120).
  std::vector<std::vector<float>> data = {
      {0.25f, 0.40f, 0.35f}, {0.40f, 0.35f, 0.25f}, {0.10f, 0.50f, 0.40f}};
  for (auto& row : data)
    for (auto& v : row) v = std::log(v);
  CtcPrefixBeamSearchOptions opts;
  opts.first_beam_size = 3;
  opts.second_beam_size = 3;
  CtcPrefixBeamSearch search(opts);
  search.Search(data);

  const auto& result = search.Outputs();
  ASSERT_TRUE(result.size() == 3);
  EXPECT_EQ(result[0], (std::vector<int>{2, 1}));
  EXPECT_EQ(result[1], (std::vector<int>{1, 2}));
  EXPECT_EQ(result[2], (std::vector<int>{1}));

  const auto& likelihood = search.Likelihood();
  EXPECT_FLOAT_EQ(std::exp(likelihood[0]), 0.2185f);
  EXPECT_FLOAT_EQ(std::exp(likelihood[1]), 0.1550f);
  EXPECT_FLOAT_EQ(std::exp(likelihood[2]), 0.1525f);

  const auto& viterbi = search.viterbi_likelihood();
  EXPECT_FLOAT_EQ(std::exp(viterbi[0]), 0.07f);
  EXPECT_FLOAT_EQ(std::exp(viterbi[1]), 0.064f);
  EXPECT_FLOAT_EQ(std::exp(viterbi[2]), 0.07f);

  const auto& times = search.Times();
  EXPECT_EQ(times[0], (std::vector<int>{0, 2}));
  EXPECT_EQ(times[1], (std::vector<int>{0, 2}));
  EXPECT_EQ(times[2], (std::vector<int>{2}));
}

TEST(ContextGraph, BoostAndFallback) {
  ContextConfig cfg;
  cfg.context_score = 2.0f;
  auto graph = std::make_shared<ContextGraph>(cfg);
  graph->Build({{5, 6, 7}, {5, 9}});
  float score;
  bool sb, eb;
  int s = graph->GetNextState(0, 5, &score, &sb, &eb);
  EXPECT_FLOAT_EQ(score, 2.0f);
  EXPECT_TRUE(sb);
  EXPECT_FALSE(eb);
  int s2 = graph->GetNextState(s, 6, &score, &sb, &eb);
  EXPECT_FLOAT_EQ(score, 2.0f);
  int s3 = graph->GetNextState(s2, 7, &score, &sb, &eb);
  EXPECT_TRUE(eb);
  EXPECT_EQ(s3, 0);  // complete match returns to root
  // Fallback refunds partial boost.
  int s4 = graph->GetNextState(0, 5, &score, &sb, &eb);
  graph->GetNextState(s4, 8, &score, &sb, &eb);
  EXPECT_FLOAT_EQ(score, -2.0f);
}

TEST(ContextGraph, SearchWithBoost) {
  // Boosted phrase {2, 1} should outrank the unboosted best.
  std::vector<std::vector<float>> data = {
      {0.25f, 0.40f, 0.35f}, {0.40f, 0.35f, 0.25f}, {0.10f, 0.50f, 0.40f}};
  for (auto& row : data)
    for (auto& v : row) v = std::log(v);
  ContextConfig cfg;
  cfg.context_score = 5.0f;
  auto graph = std::make_shared<ContextGraph>(cfg);
  graph->Build({{1, 2}});
  CtcPrefixBeamSearchOptions opts;
  opts.first_beam_size = 3;
  opts.second_beam_size = 3;
  CtcPrefixBeamSearch search(opts, graph);
  search.Search(data);
  search.FinalizeSearch();
  EXPECT_EQ(search.Outputs()[0], (std::vector<int>{1, 2}));
}

TEST(CtcEndpoint, TrailingSilence) {
  CtcEndpointConfig cfg;
  cfg.rule2 = CtcEndpointRule(true, 200, 0);  // 200ms trailing
  CtcEndpoint ep(cfg);
  ep.frame_shift_in_ms(40);
  std::vector<float> blank_frame = {std::log(0.95f), std::log(0.05f)};
  std::vector<float> speech_frame = {std::log(0.05f), std::log(0.95f)};
  std::vector<std::vector<float>> speech(3, speech_frame);
  EXPECT_FALSE(ep.IsEndpoint(speech, true));
  std::vector<std::vector<float>> silence(5, blank_frame);  // 200ms
  EXPECT_TRUE(ep.IsEndpoint(silence, true));
}

TEST(CtcEndpoint, MaxUtteranceLength) {
  CtcEndpointConfig cfg;
  cfg.rule1 = CtcEndpointRule(false, 1 << 30, 0);
  cfg.rule2 = CtcEndpointRule(true, 1 << 30, 0);
  cfg.rule3 = CtcEndpointRule(false, 0, 400);  // 400ms cap
  CtcEndpoint ep(cfg);
  ep.frame_shift_in_ms(40);
  std::vector<float> speech_frame = {std::log(0.05f), std::log(0.95f)};
  std::vector<std::vector<float>> chunk(5, speech_frame);  // 200ms
  EXPECT_FALSE(ep.IsEndpoint(chunk, false));
  EXPECT_TRUE(ep.IsEndpoint(chunk, false));  // cumulative 400ms
}

TEST(WebSocket, AcceptKeyRfcExample) {
  // RFC 6455 section 1.3 example.
  EXPECT_EQ(ws::AcceptKey("dGhlIHNhbXBsZSBub25jZQ=="),
            std::string("s3pPLMBiTxaQ9kYGzzhZRbK+xOo="));
}

TEST(WebSocket, FrameRoundTrip) {
  int fds[2];
  ASSERT_TRUE(socketpair(AF_UNIX, SOCK_STREAM, 0, fds) == 0);
  std::string payload(70000, 'x');  // forces 64-bit length path
  payload[0] = 'a';
  EXPECT_TRUE(ws::WriteMessage(fds[0], ws::kBinary, payload));
  ws::Opcode op;
  std::string got;
  EXPECT_TRUE(ws::ReadMessage(fds[1], &op, &got));
  EXPECT_EQ(op, ws::kBinary);
  EXPECT_TRUE(got == payload);
  // Small text frame.
  EXPECT_TRUE(ws::WriteMessage(fds[1], ws::kText, "hello"));
  EXPECT_TRUE(ws::ReadMessage(fds[0], &op, &got));
  EXPECT_EQ(op, ws::kText);
  EXPECT_EQ(got, std::string("hello"));
  close(fds[0]);
  close(fds[1]);
}

MINI_TEST_MAIN()
