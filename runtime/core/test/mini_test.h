// Minimal header-only test framework (gtest is not vendored; zero-egress
// build). Supports TEST, EXPECT_*/ASSERT_* with failure reporting.
#ifndef WENET_TPU_TEST_MINI_TEST_H_
#define WENET_TPU_TEST_MINI_TEST_H_

#include <cmath>
#include <cstdio>
#include <functional>
#include <string>
#include <vector>

namespace mini_test {

struct Registry {
  static Registry& Get() {
    static Registry inst;
    return inst;
  }
  std::vector<std::pair<std::string, std::function<void()>>> tests;
  int failures = 0;
  bool current_failed = false;
};

struct Registrar {
  Registrar(const std::string& name, std::function<void()> fn) {
    Registry::Get().tests.emplace_back(name, std::move(fn));
  }
};

inline int RunAll() {
  auto& reg = Registry::Get();
  int passed = 0;
  for (auto& t : reg.tests) {
    reg.current_failed = false;
    std::printf("[ RUN      ] %s\n", t.first.c_str());
    t.second();
    if (reg.current_failed) {
      ++reg.failures;
      std::printf("[  FAILED  ] %s\n", t.first.c_str());
    } else {
      ++passed;
      std::printf("[       OK ] %s\n", t.first.c_str());
    }
  }
  std::printf("%d passed, %d failed\n", passed, reg.failures);
  return reg.failures == 0 ? 0 : 1;
}

inline void Fail(const char* file, int line, const std::string& msg) {
  std::printf("  FAILURE at %s:%d: %s\n", file, line, msg.c_str());
  Registry::Get().current_failed = true;
}

}  // namespace mini_test

#define TEST(suite, name)                                             \
  static void suite##_##name##_body();                                \
  static ::mini_test::Registrar suite##_##name##_reg(                 \
      #suite "." #name, suite##_##name##_body);                       \
  static void suite##_##name##_body()

#define EXPECT_TRUE(cond)                                             \
  do {                                                                \
    if (!(cond)) ::mini_test::Fail(__FILE__, __LINE__, #cond);        \
  } while (0)

#define EXPECT_FALSE(cond) EXPECT_TRUE(!(cond))

#define EXPECT_EQ(a, b)                                               \
  do {                                                                \
    if (!((a) == (b))) ::mini_test::Fail(__FILE__, __LINE__,          \
                                         #a " == " #b);               \
  } while (0)

#define EXPECT_NEAR(a, b, tol)                                        \
  do {                                                                \
    double va = (a), vb = (b);                                        \
    if (std::fabs(va - vb) > (tol)) {                                 \
      char buf[256];                                                  \
      std::snprintf(buf, sizeof(buf), "%s(%g) !~ %s(%g) tol %g", #a,  \
                    va, #b, vb, static_cast<double>(tol));            \
      ::mini_test::Fail(__FILE__, __LINE__, buf);                     \
    }                                                                 \
  } while (0)

#define EXPECT_FLOAT_EQ(a, b) EXPECT_NEAR(a, b, 1e-4 * (std::fabs(b) + 1))

#define ASSERT_TRUE(cond)                                             \
  do {                                                                \
    if (!(cond)) {                                                    \
      ::mini_test::Fail(__FILE__, __LINE__, #cond);                   \
      return;                                                         \
    }                                                                 \
  } while (0)

#define MINI_TEST_MAIN()                                              \
  int main() { return ::mini_test::RunAll(); }

#endif  // WENET_TPU_TEST_MINI_TEST_H_
