// Sanitizer harness for the native annealer (SURVEY §5: the C++ host
// components get asan/ubsan builds). Exercises sl_gen_pattern across
// periods/shapes/temperatures and sl_wrapped_label across densities;
// built by tests/test_native_sanitize.py with
//   g++ -g -O1 -std=c++17 -fsanitize=address,undefined
// and run as a standalone binary — any heap overflow, use-after-free,
// or UB in the annealer aborts the run.

#include "annealer.cpp"

#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static void fill_random_mask(std::vector<int32_t>& mask, std::mt19937& g,
                             double density) {
  std::uniform_real_distribution<double> u(0.0, 1.0);
  for (auto& m : mask) {
    m = 0;
    if (u(g) < density) m |= 1 | 2 | 4;  // new cell + oscillate + violations
    else if (u(g) < 0.5) m |= 4;         // violations only (border halo)
  }
}

int main() {
  std::mt19937 g(12345);
  const double penalties[8] = {0, 0, 1.5, 0.5, 0.0, 1.0, 1.5, 0.5};

  int runs = 0;
  for (int period : {1, 2, 3}) {
    for (int rows : {8, 15, 26}) {
      int cols = rows + 3;
      for (double density : {0.2, 0.6, 0.95}) {
        std::vector<uint16_t> layers(period * rows * cols, 0);
        std::vector<int32_t> mask(rows * cols), seeds(rows * cols, 0);
        fill_random_mask(mask, g, density);
        seeds[(rows / 2) * cols + cols / 2] = 1;
        int rc = sl_gen_pattern(layers.data(), mask.data(), seeds.data(),
                                period, rows, cols,
                                /*rel_max_iter=*/40.0,
                                /*rel_min_fill=*/0.15,
                                /*temperature=*/0.35,
                                /*osc_bonus=*/period > 1 ? 0.3 : 0.0,
                                penalties, 1000 + runs);
        if (rc != 0 && rc != -1 && rc != -3) {
          // kOk / kMaxIterError / kAreaTooSmallError are the defined
          // outcomes
          std::fprintf(stderr, "unexpected rc %d\n", rc);
          return 2;
        }
        ++runs;
      }
    }
  }

  std::uniform_real_distribution<double> u(0.0, 1.0);
  for (int rows : {1, 7, 26, 40}) {
    int cols = rows + 1;
    for (double density : {0.1, 0.5, 0.9}) {
      std::vector<int32_t> data(rows * cols), labels(rows * cols, -7);
      for (auto& d : data) d = u(g) < density;
      int n = sl_wrapped_label(data.data(), labels.data(), rows, cols);
      if (n < 0) {
        std::fprintf(stderr, "wrapped_label failed\n");
        return 3;
      }
      for (int i = 0; i < rows * cols; ++i) {
        if (data[i] && labels[i] <= 0) return 4;   // every set cell labeled
        if (!data[i] && labels[i] != 0) return 5;  // empty cells unlabeled
      }
      ++runs;
    }
  }

  std::printf("SANITIZE_OK %d cases\n", runs);
  return 0;
}
